"""In-place transpose: serialized vs software-pipelined kernel, on-device.

VERDICT r2 weak #6: the paired-swap in-place transpose recorded 497 GB/s =
61% of v5e HBM while the repo's own streaming ceiling is 580-630 GB/s. The
serialized kernel idles HBM during the swap and idles the VPU during DMA;
the pipelined variant (transpose.py:_build_inplace_transpose_pipelined)
prefetches the next block pair during the current swap. This probe races
both + the out-of-place Mosaic-pipelined path at 8192^2 f32 across tile
sizes.

Usage: PYTHONPATH=. python tools/transpose_pipeline_probe.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.transpose import (_build_inplace_transpose,
                                     _build_inplace_transpose_pipelined,
                                     transpose2d_batched)

N = 8192
NBYTES = 2 * 4 * N * N  # read + write


def row(tag, fn, x):
    ms = chain_rate(fn, x)
    gbps = NBYTES / (ms * 1e-3) / 1e9
    print(json.dumps({"kernel": tag, "ms": round(ms, 3),
                      "GBps": round(gbps, 1),
                      "pct_hbm": round(100 * gbps / 819.0, 1)}), flush=True)


if __name__ == "__main__":
    x = jnp.asarray(np.random.RandomState(0).randn(N, N), jnp.float32)
    # correctness first (small)
    xs = jnp.asarray(np.random.RandomState(1).randn(1024, 1024), jnp.float32)
    for T in (512, 256):
        got = _build_inplace_transpose_pipelined(1024, T, "float32")(xs)
        assert bool(jnp.allclose(got, xs.T)), f"pipelined T={T} WRONG"
    print("correctness ok", flush=True)
    for T in (512, 256, 1024):
        try:
            row(f"pipelined_T{T}",
                _build_inplace_transpose_pipelined(N, T, "float32"), x)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"kernel": f"pipelined_T{T}",
                              "error": repr(e)[:150]}), flush=True)
    row("serialized_T512", _build_inplace_transpose(N, 512, "float32"), x)
    row("outofplace_mosaic", lambda v: transpose2d_batched(v[None])[0], x)
    row("xla_swapaxes", jax.jit(lambda v: jnp.swapaxes(v, 0, 1)), x)
