"""Full-mask flash variant race (round-4 item #4, third leg).

The zero-DMA probe said the (bq,bk)=(1024,2048) inner math runs 150 TF
resident while production lands 122 TF; the block race said no geometry
fixes it; and causal at (2048,2048) — SAME flops, no block skipped — runs
145 TF. So the loss is in the full-mask step body / schedule, not DMA
bandwidth. This races production-shaped variants with three toggles:

  * pad_mask   — keep / elide the `kpos < S` padding mask. At SP == S it is
                 all-true: iota + compare + where = 3 VPU passes over
                 (bq, bk) per step, ~1 us each at (1024, 2048).
  * rescale    — keep / skip the online-softmax rescale when nk == 1: with
                 a single k block, m_prev is -inf, corr is 0, and
                 acc/l start at zero — the corr exp and two fmas are dead.
  * when_wrap  — wrap the step in pl.when(ik >= 0) like the causal path
                 does, to test whether the conditional region changes
                 Mosaic's DMA/compute overlap.

Usage: python tools/attention_variant_race.py
"""

from __future__ import annotations

import functools
import itertools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laser_tpu.bench.harness import chain_rate

B, S, D = 8, 2048, 128
PEAK = 197.0
NEG_INF = -1e30


def build(bq, bk, pad_mask, rescale, when_wrap):
    nq, nk = S // bq, S // bk

    def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def _step():
            s = jax.lax.dot_general(q_ref[0], k_ref[0],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * 0.088388  # 1/sqrt(D)
            if pad_mask:
                kpos = (ik * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 1))
                s = jnp.where(kpos < S, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            if rescale:
                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev,
                                    jnp.broadcast_to(m_cur, m_prev.shape))
                corr = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new[:, :1])
                l_ref[:] = l_ref[:] * corr + jnp.broadcast_to(
                    jnp.sum(p, axis=-1, keepdims=True), corr.shape)
                acc_ref[:] = acc_ref[:] * corr[:, :D] + jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_ref[:] = m_new
            else:  # nk == 1: single k block, no running state to merge
                p = jnp.exp(s - m_cur)
                l_ref[:] = jnp.broadcast_to(
                    jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
                acc_ref[:] = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        if when_wrap:
            pl.when(ik >= 0)(_step)
        else:
            _step()

        @pl.when(ik == nk - 1)
        def _fin():
            lsafe = jnp.where(l_ref[:, :D] > 0, l_ref[:, :D], 1.0)
            o_ref[0] = (acc_ref[:] / lsafe).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(B, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * S * D, transcendentals=B * S * S,
            bytes_accessed=4 * B * S * D * 2),
    )


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.bfloat16)
    fl = 4 * B * S * S * D

    # correctness oracle (f32 reference, max |err| tolerance for bf16)
    def ref():
        qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
        s = jnp.einsum("bqd,bkd->bqk", qf, kf) * 0.088388
        return jax.nn.softmax(s, axis=-1) @ vf

    want = np.asarray(jax.jit(ref)())

    for bq, bk in [(1024, 2048), (512, 2048), (1024, 1024), (2048, 2048)]:
        nk = S // bk
        for pm, rs, ww in itertools.product((True, False), repeat=3):
            if not rs and nk != 1:
                continue  # rescale-free only valid at one k block
            try:
                fn = jax.jit(build(bq, bk, pm, rs, ww))
                got = np.asarray(fn(q, k, v)).astype(np.float32)
                err = np.abs(got - want).max()
                ms = chain_rate(lambda a, b_, c, f=fn: f(a, b_, c), q, k, v)
                tf = fl / (ms * 1e-3) / 1e12
                print(json.dumps(
                    {"bq": bq, "bk": bk, "pad_mask": pm, "rescale": rs,
                     "when": ww, "ms": round(ms, 4), "tflops": round(tf, 1),
                     "pct_peak": round(100 * tf / PEAK, 1),
                     "max_err": round(float(err), 5)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bq": bq, "bk": bk, "pad_mask": pm,
                                  "rescale": rs, "when": ww,
                                  "error": repr(e)[:140]}), flush=True)
