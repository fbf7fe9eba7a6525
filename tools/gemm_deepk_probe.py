"""Real-kernel probe of the deep-K GEMM finding (tools/gemm_structure_sweep.py).

Zero-DMA result: Mosaic's per-dot rate rises with K-depth — (512,512)x(bk)
dots reach 90.9% of bf16 peak at bk=4096 and 92.4% at bk=8192, vs the
82-84% plateau at bk<=1024 that round 2 took for the codegen ceiling. This
probe re-times the PRODUCTION kernel (build_gemm, real HBM pipeline) at
4096^3 bf16 with full-K-resident tiles to see how much of that survives DMA.

Usage: python tools/gemm_deepk_probe.py [bm bn bk ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.gemm.kernel import build_gemm

M = N = K = 4096
PEAK = 197.0


def probe(bm: int, bn: int, bk: int) -> dict:
    t0 = time.perf_counter()
    fn = build_gemm(M, N, K, bm, bn, bk, "bfloat16", "bfloat16", "float32",
                    False, False, None, "highest", False,
                    100 * 1024 * 1024)
    a = jax.random.normal(jax.random.PRNGKey(0), (M, K)).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N)).astype(jnp.bfloat16)

    def step(x, bb):
        return fn(1.0, 0.0, x, bb)

    ms = chain_rate(step, a, b)
    tflops = 2 * M * N * K / (ms * 1e-3) / 1e12
    return {"bm": bm, "bn": bn, "bk": bk, "ms": round(ms, 3),
            "tflops": round(tflops, 1),
            "pct_peak": round(100 * tflops / PEAK, 1),
            "wall_s": round(time.perf_counter() - t0, 1)}


CONFIGS = [(512, 512, 4096), (512, 1024, 4096), (1024, 512, 4096),
           (512, 512, 2048), (1024, 1024, 4096)]

if __name__ == "__main__":
    cfgs = CONFIGS
    if len(sys.argv) > 1:
        v = [int(x) for x in sys.argv[1:]]
        cfgs = [tuple(v[i:i + 3]) for i in range(0, len(v), 3)]
    for bm, bn, bk in cfgs:
        try:
            print(json.dumps(probe(bm, bn, bk)), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"bm": bm, "bn": bn, "bk": bk,
                              "error": repr(e)[:160]}), flush=True)
