"""f32 small/mid-shape GEMM probe: can a VMEM-resident / deep-K Pallas path
beat XLA where the problem fits on-chip?

Motivation (round-3 record): f32 1024^3 sits at 24.5 TFLOP/s = 74.7% of the
6-pass roofline for BOTH our dispatch and XLA — small-problem
underutilization, not a codegen ceiling. The bf16 zero-DMA probe
(tools/gemm_deepk_probe.py) showed Mosaic's per-dot rate RISES with K-depth
at small working sets (90.9-92.4% at (512,512,4096/8192)), so the one regime
where a Pallas kernel should beat the XLA emitter is "A+B+C fit VMEM":
full-K dots, few grid steps, B resident.

This probe races, at f32 1024^3 and 2048^3 (precision=HIGHEST, 6-pass):
  * XLA dot_general HIGHEST (the shipped dispatch default)
  * the production build_gemm at several full-K / deep-K tile configs
  * a whole-problem single-block kernel (grid collapses to (1,1,1))

Usage: python tools/gemm_f32_resident_probe.py [size ...]
"""

from __future__ import annotations

import json
import sys
import time

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.gemm.kernel import build_gemm

# v5e bf16 peak 197 TF; HIGHEST f32 = 6 bf16 passes per dot
PEAK6 = 197.0 / 6.0


def probe_pallas(M, bm, bn, bk) -> dict:
    t0 = time.perf_counter()
    fn = build_gemm(M, M, M, bm, bn, bk, "float32", "float32", "float32",
                    False, False, None, "highest", False,
                    100 * 1024 * 1024)
    a = jax.random.normal(jax.random.PRNGKey(0), (M, M), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.float32) * 0.05

    def step(x, bb):
        return fn(0.05, 0.0, x, bb)

    ms = chain_rate(step, a, b)
    tflops = 2 * M ** 3 / (ms * 1e-3) / 1e12
    return {"M": M, "bm": bm, "bn": bn, "bk": bk, "ms": round(ms, 4),
            "tflops": round(tflops, 2),
            "pct_6pass": round(100 * tflops / (PEAK6 * 1e0), 1),
            "wall_s": round(time.perf_counter() - t0, 1)}


def probe_xla(M) -> dict:
    a = jax.random.normal(jax.random.PRNGKey(0), (M, M), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.float32) * 0.05

    @jax.jit
    def step(x, bb):
        return 0.05 * jax.lax.dot_general(
            x, bb, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    ms = chain_rate(step, a, b)
    tflops = 2 * M ** 3 / (ms * 1e-3) / 1e12
    return {"M": M, "backend": "xla_highest", "ms": round(ms, 4),
            "tflops": round(tflops, 2),
            "pct_6pass": round(100 * tflops / PEAK6, 1)}


CONFIGS = {
    1024: [(1024, 1024, 1024),   # whole problem resident, grid (1,1,1)
           (512, 1024, 1024),    # B resident (constant j), A panels
           (256, 1024, 1024),
           (512, 512, 1024),     # deep-K quadrant
           (128, 1024, 1024)],
    2048: [(512, 2048, 2048),    # B panel 16MB: likely OOM, try anyway
           (512, 1024, 2048),    # deep-K
           (512, 512, 2048),
           (256, 1024, 2048),
           (1024, 1024, 2048),
           (512, 1024, 1024)],   # current-style for reference
}

if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [1024, 2048]
    for M in sizes:
        print(json.dumps(probe_xla(M)), flush=True)
        for bm, bn, bk in CONFIGS.get(M, []):
            try:
                print(json.dumps(probe_pallas(M, bm, bn, bk)), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"M": M, "bm": bm, "bn": bn, "bk": bk,
                                  "error": repr(e)[:160]}), flush=True)
