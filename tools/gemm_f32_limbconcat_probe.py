"""f32 GEMM limb-concatenation probe: one deep dot instead of six shallow.

XLA's f32 HIGHEST matmul on the MXU is a 6-pass bf16 decomposition: each
f32 splits into 3 bf16 limbs (hi/mid/lo) and the six products above the f32
noise floor (ah*bh, am*bh, ah*bm, al*bh, ah*bl, am*bm) are issued as six
*separate* bf16 dots of depth K. The zero-DMA structure sweep
(tools/gemm_structure_sweep.py, PERF_NOTES "MXU matmul ceiling") measured
that Mosaic's per-dot rate RISES with K depth: 82-84% of peak at K<=1024 vs
90.9-92.4% at K=4096/8192. Six depth-1024 dots therefore pay the shallow-dot
penalty six times.

This probe fuses the decomposition the other way: split in-kernel on the
VPU, lay the limbs out side-by-side along K in VMEM scratch

    A6 = [ah am ah al ah am]   (bm, 6*bk)
    B6 = [bh; bh; bm; bh; bl; bm]  (6*bk, bn)

and issue ONE bf16 dot of depth 6*bk per grid step — the exact same six
products, same accumulation into f32, but at 6x the MXU pipeline depth.
At bk=1024 the dot runs at depth 6144, where the measured per-dot rate is
~91-92% — above the 85% round-4 target for f32 1024^3.

Arms raced (per size):
  * XLA dot_general HIGHEST (the shipped dispatch default)
  * limb-concat kernel at several (bm, bn, bk)
  * control: identical kernel but six separate depth-bk dots (isolates the
    depth effect from everything else)
Each Pallas arm also reports max|err| vs the XLA HIGHEST product so the
accuracy contract is checked in the same run.

Usage: python tools/gemm_f32_limbconcat_probe.py [size ...]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laser_tpu.bench.harness import chain_rate
from laser_tpu.utils import cdiv

PEAK6 = 197.0 / 6.0  # v5e 6-pass f32 roofline, TFLOP/s

# The six limb products XLA HIGHEST keeps, as (a_limb, b_limb) index pairs
# (0=hi, 1=mid, 2=lo). Everything else is below the f32 noise floor.
PAIRS = [(0, 0), (1, 0), (0, 1), (2, 0), (0, 2), (1, 1)]


def _split3(x):
    """f32 -> (hi, mid, lo) bf16 limbs with hi+mid+lo ~= x."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def build_limbconcat(M, N, K, bm, bn, bk, *, concat=True):
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    nk = grid[2]

    def kernel(a_ref, b_ref, out_ref, acc_ref, a6_ref, b6_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a_l = _split3(a_ref[:])
        b_l = _split3(b_ref[:])
        if concat:
            for i, (ai, bi) in enumerate(PAIRS):
                a6_ref[:, i * bk:(i + 1) * bk] = a_l[ai]
                b6_ref[i * bk:(i + 1) * bk, :] = b_l[bi]
            acc_ref[:] += jax.lax.dot_general(
                a6_ref[:], b6_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # control: the six products as six shallow dots
            acc = acc_ref[:]
            for ai, bi in PAIRS:
                acc += jax.lax.dot_general(
                    a_l[ai], b_l[bi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[:] = acc

        @pl.when(k == nk - 1)
        def _():
            out_ref[:] = acc_ref[:]

    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    if concat:
        scratch += [pltpu.VMEM((bm, 6 * bk), jnp.bfloat16),
                    pltpu.VMEM((6 * bk, bn), jnp.bfloat16)]
    else:
        # keep kernel arity fixed; dummies are tiny
        scratch += [pltpu.VMEM((8, 128), jnp.bfloat16),
                    pltpu.VMEM((8, 128), jnp.bfloat16)]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K * 6,
            bytes_accessed=(M * K + K * N + M * N) * 4,
            transcendentals=0),
    )


def _inputs(M):
    a = jax.random.normal(jax.random.PRNGKey(0), (M, M), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.float32)
    return a, b


@functools.cache
def _xla_ref(M):
    a, b = _inputs(M)
    out = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST))(a, b)
    return jax.device_get(out)


def probe_pallas(M, bm, bn, bk, concat):
    t0 = time.perf_counter()
    fn = jax.jit(build_limbconcat(M, M, M, bm, bn, bk, concat=concat))
    a, b = _inputs(M)
    got = jax.device_get(fn(a, b))
    ref = _xla_ref(M)
    err = float(abs(got - ref).max() / abs(ref).max())
    ms = chain_rate(lambda x, y: fn(x, y), a, b)
    tflops = 2 * M ** 3 / (ms * 1e-3) / 1e12
    return {"M": M, "bm": bm, "bn": bn, "bk": bk,
            "arm": "limbconcat" if concat else "six_dots",
            "ms": round(ms, 4), "tflops": round(tflops, 2),
            "pct_6pass": round(100 * tflops / PEAK6, 1),
            "rel_err_vs_xla": f"{err:.2e}",
            "wall_s": round(time.perf_counter() - t0, 1)}


def probe_xla(M):
    a, b = _inputs(M)
    fn = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST))
    ms = chain_rate(fn, a, b)
    tflops = 2 * M ** 3 / (ms * 1e-3) / 1e12
    return {"M": M, "arm": "xla_highest", "ms": round(ms, 4),
            "tflops": round(tflops, 2),
            "pct_6pass": round(100 * tflops / PEAK6, 1)}


CONFIGS = {
    1024: [(512, 1024, 1024, True), (256, 1024, 1024, True),
           (512, 512, 1024, True), (128, 1024, 1024, True),
           (512, 1024, 1024, False)],
    2048: [(512, 1024, 2048, True), (256, 2048, 1024, True),
           (512, 512, 2048, True), (256, 1024, 2048, True),
           (512, 1024, 1024, True)],
    4096: [(512, 1024, 2048, True), (256, 1024, 4096, True),
           (512, 512, 4096, True)],
}

if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [1024, 2048]
    for M in sizes:
        print(json.dumps(probe_xla(M)), flush=True)
        for bm, bn, bk, cc in CONFIGS.get(M, []):
            try:
                print(json.dumps(probe_pallas(M, bm, bn, bk, cc)), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"M": M, "bm": bm, "bn": bn, "bk": bk,
                                  "arm": "limbconcat" if cc else "six_dots",
                                  "error": repr(e)[:160]}), flush=True)
