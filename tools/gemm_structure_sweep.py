"""Zero-DMA GEMM structure sweep — where does Mosaic's matmul ceiling sit?

The round-2 finding (docs/PERF_NOTES.md "MXU matmul ceiling"): Pallas
jnp.dot-per-block kernels plateau at ~150-162 TFLOP/s (~82% of v5e bf16
roofline) regardless of tile shape, while XLA's emitter reaches ~186 (94%).
A zero-DMA microbenchmark (operands VMEM-resident, constant index maps)
showed the same ~150 — so the gap is dot *codegen/issue structure*, not data
movement. The int8 variant of the same microbench jumped from ~66% to 78% of
peak when the kernel issued 16 independent dots per grid step.

This script runs that structure experiment for bf16/f32: per grid step issue
S dots instead of 1, splitting the block along M (independent output rows),
N (independent output cols), K (serial value-chain accumulation, i.e.
register accumulator instead of VMEM read-modify-write), or fully distinct
(S separate A/B/acc triples — the exact int8 microbench structure).

All variants are zero-DMA: whole operands live in VMEM (single block,
constant index maps); a grid of R "arbitrary" steps re-issues the dots so
one dispatch runs long enough (>200 ms) to swamp the tunnel RTT. Inputs are
perturbed per dispatch to defeat execution memoization.

Usage:
  python tools/gemm_structure_sweep.py                 # default bf16 sweep
  python tools/gemm_structure_sweep.py --variant msplit --s 4
  python tools/gemm_structure_sweep.py --dtype float32

Findings feed laser_tpu/ops/gemm/kernel.py (msplit parameter) and the
measured Pallas-vs-XLA dispatch in gemm/api.py. Reference standard this
chases: the reference's own-kernel GEMM matches its vendor (OpenBLAS) at
97-102% (/root/reference/README.md:209-210).
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMS = (((1,), (0,)), ((), ()))
_UNIQ = itertools.count(1)


def _dot(a, b):
    return jax.lax.dot_general(a, b, _DIMS, preferred_element_type=jnp.float32)


def build(variant: str, bm: int, bn: int, bk: int, s: int, R: int, dtype):
    """Return (fn(a, b) -> acc, flops_per_dispatch, operand shapes)."""
    if variant == "distinct":
        a_shape, b_shape, o_shape = (s, bm, bk), (s, bk, bn), (s, bm, bn)
        flops = R * s * 2 * bm * bn * bk
    else:
        a_shape, b_shape, o_shape = (bm, bk), (bk, bn), (bm, bn)
        flops = R * 2 * bm * bn * bk

    def kernel(a_ref, b_ref, o_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _init():
            o_ref[:] = jnp.zeros_like(o_ref)

        if variant == "one":
            o_ref[:] += _dot(a_ref[:], b_ref[:])
        elif variant == "store":
            # no accumulate: isolates the VMEM read-modify-write cost
            o_ref[:] = _dot(a_ref[:], b_ref[:])
        elif variant == "msplit":
            sm = bm // s
            for i in range(s):
                o_ref[i * sm:(i + 1) * sm] += _dot(
                    a_ref[i * sm:(i + 1) * sm], b_ref[:])
        elif variant == "nsplit":
            sn = bn // s
            for i in range(s):
                o_ref[:, i * sn:(i + 1) * sn] += _dot(
                    a_ref[:], b_ref[:, i * sn:(i + 1) * sn])
        elif variant == "ksplit":
            # Serial value chain: accumulate in registers, one VMEM add at end.
            kc = bk // s
            acc = _dot(a_ref[:, 0:kc], b_ref[0:kc])
            for i in range(1, s):
                acc += _dot(a_ref[:, i * kc:(i + 1) * kc],
                            b_ref[i * kc:(i + 1) * kc])
            o_ref[:] += acc
        elif variant == "distinct":
            for i in range(s):
                o_ref[i] += _dot(a_ref[i], b_ref[i])
        elif variant == "mnsplit":
            # s x s grid of independent sub-dots (s*s dot issues).
            sm, sn = bm // s, bn // s
            for i in range(s):
                for j in range(s):
                    o_ref[i * sm:(i + 1) * sm, j * sn:(j + 1) * sn] += _dot(
                        a_ref[i * sm:(i + 1) * sm],
                        b_ref[:, j * sn:(j + 1) * sn])
        else:
            raise ValueError(variant)

    zero = lambda r: tuple(0 for _ in range(len(a_shape)))
    call = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(a_shape, lambda r: (0,) * len(a_shape),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_shape, lambda r: (0,) * len(b_shape),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(o_shape, lambda r: (0,) * len(o_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(o_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )
    return jax.jit(call), flops, (a_shape, b_shape)


def measure(variant: str, bm: int, bn: int, bk: int, s: int, R: int,
            dtype, reps: int = 3) -> dict:
    fn, flops, (a_shape, b_shape) = build(variant, bm, bn, bk, s, R, dtype)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, a_shape, jnp.float32).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), b_shape,
                          jnp.float32).astype(dtype)
    # Through the axon tunnel, block_until_ready does NOT wait for remote
    # execution — only a device_get of the result does (same reason
    # bench/harness.py:chain_rate fetches a scalar).
    def run(x):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(x, b)[(0,) * len(a_shape)]))
        return time.perf_counter() - t0

    compile_s = run(a)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        ap = (a + jnp.asarray(next(_UNIQ) * 1e-6, dtype)).block_until_ready()
        best = min(best, run(ap))
    tflops = flops / best / 1e12
    return {"variant": variant, "bm": bm, "bn": bn, "bk": bk, "s": s,
            "R": R, "dtype": str(jnp.dtype(dtype)),
            "tflops": round(tflops, 1),
            "pct_bf16_peak": round(100 * tflops / 197.0, 1),
            "dispatch_ms": round(best * 1e3, 1),
            "compile_s": round(compile_s, 1)}


DEFAULT_SWEEP = [
    # (variant, bm, bn, bk, s, R)
    ("one",      512, 512, 1024, 1, 60000),   # calibration: ~150 expected
    ("one",     1024, 1024, 1024, 1, 15000),
    ("msplit",  1024, 1024, 1024, 2, 15000),
    ("msplit",  1024, 1024, 1024, 4, 15000),
    ("msplit",  1024, 1024, 1024, 8, 15000),
    ("nsplit",  1024, 1024, 1024, 4, 15000),
    ("ksplit",  1024, 1024, 1024, 4, 15000),
    ("mnsplit", 1024, 1024, 1024, 2, 15000),
    ("distinct", 256, 256, 512, 16, 30000),   # the int8 microbench structure
    ("distinct", 512, 512, 512, 4, 30000),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant")
    ap.add_argument("--s", type=int, default=4)
    ap.add_argument("--bm", type=int, default=1024)
    ap.add_argument("--bn", type=int, default=1024)
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--R", type=int, default=15000)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    print(f"devices: {jax.devices()}", flush=True)
    if args.variant:
        rows = [(args.variant, args.bm, args.bn, args.bk, args.s, args.R)]
    else:
        rows = DEFAULT_SWEEP
    for variant, bm, bn, bk, s, R in rows:
        try:
            res = measure(variant, bm, bn, bk, s, R, dtype)
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad config
            res = {"variant": variant, "bm": bm, "bn": bn, "bk": bk, "s": s,
                   "error": repr(e)[:200]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
