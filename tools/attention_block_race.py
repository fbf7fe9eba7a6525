"""End-to-end flash block-geometry race (round-4 item #4, second half).

The zero-DMA probe (tools/attention_ceiling_probe.py) pinned the full-mask
ceiling by arm and geometry: the production (bq=1024, bk=2048) inner math
runs 76.4% of peak resident, and (bq=2048, bk=1024) runs 81.9% — while the
shipped end-to-end number was 62%. The gap is schedule (per-grid-step
prologue/epilogue + stats-init/final-write once per q block), not HBM: the
whole B8 S2048 problem moves only ~16 MB against 560 GFLOP of math.

This races the PRODUCTION kernel at the benched shape over (block_q,
block_k) to pick the default. Larger bq amortizes the acc/stats
init+finalize over more math; bk <= S keeps a k-stream the pipeline can
overlap.

Usage: python tools/attention_block_race.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.attention import attention

B, S, D = 8, 2048, 128
PEAK = 197.0

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.bfloat16)
fl = 4 * B * S * S * D

for causal in (False, True):
    # chunk=None -> the shipped per-mask default; explicit values race the
    # in-body interleave width (see _build_flash / PERF_NOTES round 4:
    # full wants 1024, causal 512, ck=256 over-fragments, and lax.cond
    # chunk-skipping loses outright)
    # round-5 VERDICT #7: the resident-step probe favors (bq=2048,
    # bk=1024) at 81.9% vs the shipped 76.4% — race that geometry with
    # every interleave width, plus bq=2048 against wide panels
    for bq, bk, ckk in [(1024, 2048, None), (1024, 2048, 1024),
                        (1024, 2048, 512), (1024, 2048, 256),
                        (2048, 1024, None), (2048, 1024, 512),
                        (2048, 1024, 256),
                        (2048, 2048, None), (2048, 2048, 1024),
                        (2048, 2048, 512),
                        (1024, 1024, None), (1024, 1024, 512),
                        (2048, 512, None), (512, 2048, None)]:
        try:
            ms = chain_rate(
                lambda a, b_, c, bq=bq, bk=bk, ckk=ckk: attention(
                    a, b_, c, causal=causal, block_q=bq, block_k=bk,
                    chunk=ckk)
                .astype(jnp.bfloat16), q, k, v)
            tf = fl / (ms * 1e-3) / 1e12
            print(json.dumps({"causal": causal, "bq": bq, "bk": bk,
                              "chunk": ckk, "ms": round(ms, 4), "tflops": round(tf, 1),
                              "pct_peak": round(100 * tf / PEAK, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"causal": causal, "bq": bq, "bk": bk,
                              "chunk": ckk, "error": repr(e)[:160]}), flush=True)
