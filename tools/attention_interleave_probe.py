"""Full-mask flash: in-body chunk interleave experiment (round-4 item #4).

Where the 61% wall comes from (established by tools/attention_ceiling_probe
+ attention_variant_race + the memory-space/launch tests): each grid step
is the serial chain MXU(q@k^T) -> VPU(exp) -> MXU(p@v). Resident, that
chain runs 76% of peak; the individual dots run ~84%. Mosaic will not
software-pipeline ACROSS grid steps (bk=512 with nk=4 grid steps measured
97 TF — worse), so the VPU exp never hides under an independent dot.

This variant gives the scheduler that freedom INSIDE one kernel body: the
full k/v panel (bk = S) arrives as one block, and an UNROLLED chunk loop
runs online softmax chunk by chunk — chunk c's exp/rescale has no data
dependency on chunk c+1's s-dot, so the compiler may interleave them.
Live f32 intermediates shrink from (bq, S) to (bq, chunk) as a bonus.

Usage: python tools/attention_interleave_probe.py
"""

from __future__ import annotations

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
SCALE = 0.088388


def build(bq, chunk):
    nc = S // chunk

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        m = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, D), jnp.float32)
        for c in range(nc):  # unrolled: chunks are independent dots
            kc = k_ref[0, c * chunk:(c + 1) * chunk, :]
            vc = v_ref[0, c * chunk:(c + 1) * chunk, :]
            s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * SCALE
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
        o_ref[0] = (acc / l).astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(B, S // bq),
        in_specs=[pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
                  pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                  pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
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

    def ref():
        qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
        s = jnp.einsum("bqd,bkd->bqk", qf, kf) * SCALE
        return jax.nn.softmax(s, axis=-1) @ vf

    want = np.asarray(jax.jit(ref)())

    for bq in (1024, 512, 2048):
        for chunk in (512, 1024, 256, 2048):
            try:
                fn = jax.jit(build(bq, chunk))
                got = np.asarray(fn(q, k, v)).astype(np.float32)
                err = np.abs(got - want).max()
                ms = chain_rate(lambda a, b_, c, f=fn: f(a, b_, c), q, k, v)
                tf = fl / (ms * 1e-3) / 1e12
                print(json.dumps({"bq": bq, "chunk": chunk,
                                  "ms": round(ms, 4), "tflops": round(tf, 1),
                                  "pct_peak": round(100 * tf / PEAK, 1),
                                  "max_err": round(float(err), 5)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bq": bq, "chunk": chunk,
                                  "error": repr(e)[:140]}), flush=True)
