"""Flash-attention BACKWARD: geometry + in-body chunk interleave race.

The backward's grid step is the same serial chain the forward had —
MXU(s-dot), MXU(dp-dot), VPU(exp + ds), MXU(accumulate dots) — so the
forward's winning transform (commit 37b0260: split the streamed panel into
in-body sub-chunks so Mosaic overlaps chunk c's VPU work with chunk c+1's
independent dots) applies. AND the backward's block geometry is free: the
saved softmax stats (m, l) are per-row, so (bq, bk) for the backward
kernels need not match the forward's — this races the REAL kernels
(ops/attention_bwd.py) over geometry x chunk at the flagship shape.

Backward FLOPs convention: 2.5x forward (5 S^2-size dots vs the forward's
2: s, dp, ds@k, ds^T@q, p^T@do) = 10 * B * S^2 * D, halved for causal.

Usage:
  python tools/attention_bwd_race.py            # bf16 geometry x chunk
  python tools/attention_bwd_race.py --f32      # f32 (chunk only; flat)
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.attention import _flash_forward_padded
from laser_tpu.ops.attention_bwd import flash_attention_bwd

B, S, D = 8, 2048, 128
SCALE = 1.0 / np.sqrt(D)
PEAK = {"bfloat16": 197.0, "float32": 32.8}  # v5e; f32 via 6-pass bf16x3

GEOS = [(1024, 1024), (1024, 512), (512, 512), (512, 1024),
        (1024, 2048), (2048, 1024), (2048, 2048)]
CHUNKS = (None, 512, 256, 128)


def run(dtype, causal, geos, chunks):
    rng = np.random.RandomState(0)
    dt = jnp.dtype(dtype)
    q, k, v, g = (jnp.asarray(rng.randn(B, S, D) * 0.3, dt)
                  for _ in range(4))
    # residuals once, production forward geometry; stats are per-row so any
    # backward (bq, bk) consumes them
    # block_k=None -> the production forward default (2048 bf16, 1024 f32
    # whose wider rows would blow scoped VMEM at 2048)
    out, (q3, k3, v3, o3, m3, l3), (BH, S_, SP, DP, fbq, fbk) = (
        _flash_forward_padded(q, k, v, causal, SCALE, 1024, None, False))
    g3 = jnp.pad(g, ((0, 0), (0, SP - S), (0, DP - D)))
    fl = 10 * B * S * S * D * (0.5 if causal else 1.0)

    base = None
    for bq, bk in geos:
        if SP % bq or SP % bk:
            continue
        for chunk in chunks:
            if chunk is not None and (bk % chunk or bq % chunk):
                continue

            def _bwd(q3, k3, v3, o3, m3, l3, g3,
                     _c=chunk, _bq=bq, _bk=bk):
                return flash_attention_bwd(
                    q3, k3, v3, o3, m3, l3, g3, S=S, SP=SP, D=DP,
                    bq=_bq, bk=_bk, causal=causal, scale=float(SCALE),
                    interpret=False, chunk=_c)

            def step(x, k3, v3, o3, m3, l3, g3, _f=_bwd):
                # chain on q3 -> tanh(dq + dk - dv): keeps all three
                # outputs live (no DCE) at bounded magnitude
                dq, dk, dv = _f(x, k3, v3, o3, m3, l3, g3)
                return jnp.tanh(dq + dk - dv)

            try:
                got = jax.jit(_bwd)(q3, k3, v3, o3, m3, l3, g3)
                jax.block_until_ready(got)
                if base is None:
                    base = [np.asarray(t, np.float32) for t in got]
                    err = 0.0
                else:
                    err = max(
                        float(np.abs(np.asarray(t, np.float32) - b).max())
                        for t, b in zip(got, base))
                ms = chain_rate(step, q3, k3, v3, o3, m3, l3, g3)
                tf = fl / (ms * 1e-3) / 1e12
                print(json.dumps({
                    "dtype": dtype, "causal": causal, "bq": bq, "bk": bk,
                    "chunk": chunk, "ms": round(ms, 4),
                    "tflops": round(tf, 1),
                    "pct_peak": round(100 * tf / PEAK[dtype], 1),
                    "max_err_vs_first": round(err, 5)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"dtype": dtype, "causal": causal,
                                  "bq": bq, "bk": bk, "chunk": chunk,
                                  "error": repr(e)[:140]}), flush=True)


if __name__ == "__main__":
    if "--f32" in sys.argv:
        # wider f32 panels need the kernels' raised vmem_limit_bytes (the
        # 16 MB default scoped-OOMed at bk=1024)
        for causal in (False, True):
            run("float32", causal, [(1024, 1024), (1024, 512)],
                (None, 256))
    elif "--refine" in sys.argv:
        # chunk refinement on a winner geometry: --refine BQ BK [chunks...]
        i = sys.argv.index("--refine")
        bq, bk = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        cks = tuple(int(c) for c in sys.argv[i + 3:]) or (512, 128)
        for causal in (False, True):
            run("bfloat16", causal, [(bq, bk)], cks)
    else:
        for causal in (False, True):
            run("bfloat16", causal, GEOS, (None, 256))
