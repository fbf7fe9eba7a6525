"""Streamed int8 GEMM structure probe — can the multi-dot lever move the
REAL (HBM-pipelined) kernel like it moved the zero-DMA microbench?

Round-2/3 facts (docs/PERF_NOTES.md "MXU matmul ceiling"): the zero-DMA
int8 microbench jumps 66% -> 78% of peak when each invocation issues 16
distinct dots; the product int8 GEMM (full-K blocks 1024x512x4096, one
dot per grid step) records 262.5 TOP/s = 66.6%. The bf16 sweep showed
multi-dot does nothing for bf16 — int8 was never probed STREAMED.

Variants (per grid step, same (bm, bk)x(bk, bn) block):
  single      one dot (the shipped structure)
  msplit-S    S dots over M slices, same B panel, S accumulator slices
  ksplit-S    S dots over K slices, accumulated into ONE accumulator
  mk-SxT      S M-slices x T K-slices

Usage: python tools/gemm_int8_stream_probe.py [--m 4096]
"""
import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laser_tpu.bench.harness import chain_rate


def build(M, N, K, bm, bn, bk, ms, ks, interpret=False):
    grid = (M // bm, N // bn, K // bk)
    nk = grid[2]
    dims = (((1,), (0,)), ((), ()))

    def kernel(a_ref, b_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:]
        b = b_ref[:]
        sm, sk = bm // ms, bk // ks
        for i in range(ms):
            asl = a[i * sm:(i + 1) * sm]
            parts = []
            for j in range(ks):
                parts.append(jax.lax.dot_general(
                    asl[:, j * sk:(j + 1) * sk],
                    b[j * sk:(j + 1) * sk], dims,
                    preferred_element_type=jnp.int32))
            s = parts[0]
            for p in parts[1:]:
                s = s + p
            acc_ref[i * sm:(i + 1) * sm] += s

        @pl.when(k == nk - 1)
        def _done():
            out_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--cases", type=str, default="",
                    help="comma-separated case names (default: all)")
    args = ap.parse_args()
    M = N = K = args.m
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(-8, 8, (M, K)), jnp.int8)
    b = jnp.asarray(rng.randint(-8, 8, (K, N)), jnp.int8)
    fl = 2 * M * N * K
    t_drift = chain_rate(jax.jit(lambda x: x + jnp.int8(1)), a)

    want = None
    all_cases = [("single 1024x512xfullK", 1024, 512, K, 1, 1),
                 ("msplit-4", 1024, 512, K, 4, 1),
                 ("msplit-16", 1024, 512, K, 16, 1),
                 ("ksplit-4", 1024, 512, K, 1, 4),
                 ("ksplit-16", 1024, 512, K, 1, 16),
                 ("mk-4x4", 1024, 512, K, 4, 4),
                 ("single 256x256x512 grid", 256, 256, 512, 1, 1),
                 ("mk-2x8 512x512", 512, 512, K, 2, 8)]
    ap2 = args.cases
    cases = ([c for c in all_cases if c[0] in ap2.split(",")]
             if ap2 else all_cases)
    for name, bm, bn, bk, ms, ks in cases:
        try:
            call = build(M, N, K, bm, bn, bk, ms, ks)
            out = call(a, b)
            if want is None:
                # device oracle: XLA's own int8 dot (exact int32 accum);
                # a host numpy int32 4096^3 matmul takes minutes
                want = jax.jit(lambda x, y: jax.lax.dot_general(
                    x, y, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))(a, b)
            ok = bool(jnp.all(out == want))

            def step(x, y, call=call):
                o = call(x, y)
                return x + (jnp.sum(o, dtype=jnp.int32) & 1).astype(jnp.int8)
            t = max(chain_rate(step, a, b, trials=2) - t_drift, 1e-6)
            print(f"{name:26s}: {fl/t/1e9:8.1f} GINTOP/s  "
                  f"({fl/t/1e9/394e3*100:.1f}% peak)  exact={ok}")
        except Exception as e:
            print(f"{name:26s}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
