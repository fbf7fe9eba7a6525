"""Zero-DMA attention ceiling probe (the GEMM methodology, round-4 item #4).

Round 3 left flash attention full-mask at 62% of bf16 peak (121.7 TF) while
causal reaches 71% — beating XLA's naive S^2 comparator but with unprobed
roofline headroom. This probe answers *where the ceiling is* by timing the
flash inner loop with every operand VMEM-resident (zero HBM traffic after
the prologue), decomposed into arms:

  * full     — the production inner step: s = q@k^T, online-softmax update,
               o += p@v  (4*bq*bk*D flops/step, bq*bk exps)
  * qk_only  — s = q@k^T + running max only: isolates the depth-D=128
               shallow dot (the MXU pipeline never fills at depth 128)
  * pv_only  — o += p@v at depth bk: the deep half
  * nosoft   — both dots, no exp/max bookkeeping: the VPU-free ceiling

Interpretation: if `full` lands near the measured end-to-end 62%, the
kernel is math-bound and the number IS the ceiling; if `full` is well
above, the production schedule (DMA/pipelining) is leaving time on the
table. qk_only vs pv_only apportions the math bound between the shallow
and deep dots.

Usage: python tools/attention_ceiling_probe.py [bq bk ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laser_tpu.bench.harness import chain_rate

D = 128
PEAK = 197.0  # v5e bf16 TFLOP/s
ITERS = 64


def build(bq, bk, arm):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q = q_ref[:]
        k = k_ref[:]
        if arm in ("full", "qk_only", "nosoft"):
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if arm == "qk_only":
            m_ref[:] = jnp.maximum(m_ref[:], jnp.max(s, axis=-1,
                                                     keepdims=True))
            return
        if arm == "full":
            m_prev = m_ref[:, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif arm == "nosoft":
            acc_ref[:] += jax.lax.dot_general(
                s.astype(jnp.bfloat16), v_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif arm == "pv_only":
            # p is a stand-in resident bf16 matrix: reuse q broadcast —
            # shape (bq, bk) built once from iota to keep it cheap
            p = (q[:, :1] + jnp.zeros((bq, bk), jnp.float32)).astype(
                jnp.bfloat16)
            acc_ref[:] += jax.lax.dot_general(
                p, v_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(t == ITERS - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(ITERS,),
        in_specs=[pl.BlockSpec((bq, D), lambda t: (0, 0)),
                  pl.BlockSpec((bk, D), lambda t: (0, 0)),
                  pl.BlockSpec((bk, D), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((bq, D), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bq, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def probe(bq, bk, arm):
    t0 = time.perf_counter()
    fn = jax.jit(build(bq, bk, arm))
    q = jax.random.normal(jax.random.PRNGKey(0), (bq, D)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bk, D)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bk, D)).astype(jnp.bfloat16)

    def step(qq, kk):
        o = fn(qq, kk, v)
        return (qq + o * 0).astype(jnp.bfloat16), kk

    ms = chain_rate(lambda qq, kk: step(qq, kk)[0], q, k)
    per_iter = {"full": 4, "nosoft": 4, "qk_only": 2, "pv_only": 2}[arm]
    fl = per_iter * bq * bk * D * ITERS
    tf = fl / (ms * 1e-3) / 1e12
    return {"bq": bq, "bk": bk, "arm": arm, "ms": round(ms, 4),
            "tflops": round(tf, 1), "pct_peak": round(100 * tf / PEAK, 1),
            "wall_s": round(time.perf_counter() - t0, 1)}


CONFIGS = [(512, 1024), (256, 1024), (512, 2048), (1024, 1024), (512, 512)]

if __name__ == "__main__":
    cfgs = CONFIGS
    if len(sys.argv) > 1:
        v = [int(x) for x in sys.argv[1:]]
        cfgs = [tuple(v[i:i + 2]) for i in range(0, len(v), 2)]
    for bq, bk in cfgs:
        for arm in ("full", "nosoft", "qk_only", "pv_only"):
            try:
                print(json.dumps(probe(bq, bk, arm)), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bq": bq, "bk": bk, "arm": arm,
                                  "error": repr(e)[:160]}), flush=True)
