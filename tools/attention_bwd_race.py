"""Flash-attention BACKWARD: in-body chunk interleave race (round 4).

The backward's grid step is the same serial chain the forward had —
MXU(s-dot), MXU(dp-dot), VPU(exp + ds), MXU(accumulate dots) — so the
forward's winning transform (commit 37b0260: split the streamed panel into
in-body sub-chunks so Mosaic overlaps chunk c's VPU work with chunk c+1's
independent dots) should apply. This races the REAL kernels
(ops/attention_bwd.py, ``chunk=`` threaded through both _build_bwd_dq and
_build_bwd_dkv) at the flagship shape, full + causal, bf16 and f32.

Backward FLOPs convention: 2.5x forward (5 S^2-size dots vs the forward's
2: s, dp, ds@k, ds^T@q, p^T@do) = 10 * B * S^2 * D.

Usage: python tools/attention_bwd_race.py
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.attention import _flash_forward_padded
from laser_tpu.ops.attention_bwd import flash_attention_bwd

B, S, D = 8, 2048, 128
SCALE = 1.0 / np.sqrt(D)
PEAK = {"bfloat16": 197.0, "float32": 32.8}  # v5e, f32 via 6-pass bf16x3


def run(dtype, causal):
    rng = np.random.RandomState(0)
    dt = jnp.dtype(dtype)
    q, k, v, g = (jnp.asarray(rng.randn(B, S, D) * 0.3, dt)
                  for _ in range(4))
    out, (q3, k3, v3, o3, m3, l3), (BH, S_, SP, DP, bq, bk) = (
        _flash_forward_padded(q, k, v, causal, SCALE, 1024, 512, False))
    g3 = jnp.pad(g, ((0, 0), (0, SP - S), (0, DP - D)))
    fl = 10 * B * S * S * D * (0.5 if causal else 1.0)

    base = None
    for chunk in (None, 1024, 512, 256, 128):
        if chunk is not None and (bk % chunk or bq % chunk):
            continue

        def _bwd(q3, k3, v3, o3, m3, l3, g3, _c=chunk):
            # _c via closure default: a plain Python int at trace time
            # (jit would trace an unprovided int default into a tracer,
            # which build_cache cannot key on)
            return flash_attention_bwd(
                q3, k3, v3, o3, m3, l3, g3, S=S, SP=SP, D=DP, bq=bq, bk=bk,
                causal=causal, scale=float(SCALE), interpret=False, chunk=_c)

        def bwd(q3, k3, v3, o3, m3, l3, g3):
            return _bwd(q3, k3, v3, o3, m3, l3, g3)

        bwd = jax.jit(bwd)

        def step(x, k3, v3, o3, m3, l3, g3):
            # chain on q3 -> tanh(dq + dk - dv): keeps all three outputs
            # live (no DCE of either kernel) at bounded magnitude
            dq, dk, dv = _bwd(x, k3, v3, o3, m3, l3, g3)
            return jnp.tanh(dq + dk - dv)

        try:
            got = bwd(q3, k3, v3, o3, m3, l3, g3)
            jax.block_until_ready(got)
            if chunk is None:
                base = [np.asarray(t, np.float32) for t in got]
                err = 0.0
            else:
                err = max(float(np.abs(np.asarray(gt, np.float32) - b).max())
                          for gt, b in zip(got, base))
            ms = chain_rate(step, q3, k3, v3, o3, m3, l3, g3)
            tf = fl / (ms * 1e-3) / 1e12
            print(json.dumps({
                "dtype": dtype, "causal": causal, "chunk": chunk,
                "bq": bq, "bk": bk, "ms": round(ms, 4),
                "tflops": round(tf, 1),
                "pct_peak": round(100 * tf / PEAK[dtype], 1),
                "max_err_vs_unchunked": round(err, 5)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"dtype": dtype, "causal": causal,
                              "chunk": chunk, "error": repr(e)[:140]}),
                  flush=True)


if __name__ == "__main__":
    for dtype in ("bfloat16", "float32"):
        for causal in (False, True):
            run(dtype, causal)
