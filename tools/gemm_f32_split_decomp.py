"""Decompose the f32 limb-concat deep-dot design into its component costs.

Round-4 question (VERDICT #1): the zero-DMA probe says deep bf16 dots run at
90.9-92.4% of peak, so ONE depth-6K limb-concatenated dot should beat the
streamed 6-pass f32 kernel (81.5% at 1024^3) — yet the built kernels measure
73.4% (naive rebuild) and 63.8% (persistent B6). Where does the time go?

Three single-block (grid (1,1)) kernels at 1024^3-equivalent shapes:
  1. pure_dot   — a6 (M,6K) bf16 and b6 (6K,N) bf16 arrive as INPUTS;
                  kernel is ONE dot. This is the ceiling of the design.
  2. split_only — a (M,K) f32 input; kernel builds the (M,6K) bf16 limb
                  scratch and writes one row of it to the output (so the
                  build isn't dead-code-eliminated). This is the overhead.
  3. fused      — a, b f32 inputs; kernel builds both scratches then does
                  the one deep dot. This is the shippable variant; its time
                  should be ~ (1) + 2x(2)'s build cost.

If (3) < the streamed kernel's 0.0802 ms, productionize; else commit this
log as the ceiling evidence: the limb split costs more VMEM traffic than
the deep-dot rate gain returns at problems this small.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laser_tpu.bench.harness import chain_rate

PEAK6 = 197.0 / 6.0  # v5e 6-pass f32 roofline, TFLOP/s
PAIRS = ((0, 0), (1, 0), (0, 1), (2, 0), (0, 2), (1, 1))


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _time(fn, *args, label):
    t0 = time.perf_counter()
    ms = chain_rate(fn, *args)
    eff = 2 * 1024**3 / (ms * 1e-3) / 1e12
    print(json.dumps({"probe": label, "ms": round(ms, 4),
                      "f32_eff_tflops": round(eff, 2),
                      "pct_6pass": round(100 * eff / PEAK6, 1),
                      "compile_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    return ms


def main(M=1024):
    K = N = M
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(K, N) * 0.05, jnp.float32)
    ah, am, al = _split3(a)
    bh, bm_, bl = _split3(b)
    a6 = jnp.concatenate([(ah, am, al)[i] for i, _ in PAIRS], axis=1)
    b6 = jnp.concatenate([(bh, bm_, bl)[j] for _, j in PAIRS], axis=0)

    # 1. pure deep dot, operands resident as inputs
    def k_pure(a6_ref, b6_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a6_ref[:], b6_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    pure = pl.pallas_call(
        k_pure,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def pure_step(x6, y6):
        o = pure(x6, y6)
        return x6 + (jnp.sum(o) * 1e-30).astype(jnp.bfloat16)

    _time(pure_step, a6, b6, label=f"pure_dot_{M}x{N}x6K")

    # 2. split+scratch-build only (one side)
    def k_split(a_ref, o_ref, a6_ref):
        hi, mid, lo = _split3(a_ref[:])
        for idx, (ai, _) in enumerate(PAIRS):
            a6_ref[:, idx * K:(idx + 1) * K] = (hi, mid, lo)[ai]
        o_ref[:] = a6_ref[:, :N].astype(jnp.float32)

    split = pl.pallas_call(
        k_split,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, 6 * K), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def split_step(x):
        o = split(x)
        return x + (jnp.sum(o) * 1e-30).astype(jnp.float32)

    _time(split_step, a, label=f"split_build_{M}x6K")

    # 3. fused: split both sides + one deep dot, all in one block
    def k_fused(a_ref, b_ref, o_ref, a6_ref, b6_ref):
        hi, mid, lo = _split3(a_ref[:])
        for idx, (ai, _) in enumerate(PAIRS):
            a6_ref[:, idx * K:(idx + 1) * K] = (hi, mid, lo)[ai]
        hi, mid, lo = _split3(b_ref[:])
        for idx, (_, bi) in enumerate(PAIRS):
            b6_ref[idx * K:(idx + 1) * K, :] = (hi, mid, lo)[bi]
        o_ref[:] = jax.lax.dot_general(
            a6_ref[:], b6_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    fused = pl.pallas_call(
        k_fused,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, 6 * K), jnp.bfloat16),
                        pltpu.VMEM((6 * K, N), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def fused_step(x, y):
        return 0.0 * x + fused(x, y) * 0.05  # keep shapes/dtypes chained

    _time(fused_step, a, b, label=f"fused_split_dot_{M}^3")
    # (numerics of the 6-limb decomposition are already certified by the
    # interpret-mode f32_deep test vs HIGHEST — no 224s XLA HIGHEST compile
    # here; this probe is timing-only)

    # 4. pure deep dot TILED: same resident a6/b6 inputs, grid over output
    # tiles — maps Mosaic's dot rate vs tile geometry at depth 6K. The
    # structure sweep's 90.9-92.4% was at (512,512) tiles; arm (1) above
    # shows (1024,1024) collapses to ~75%.
    for bm, bn in ((512, 1024), (512, 512), (256, 1024), (256, 512)):
        def k_tiled(a6_ref, b6_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a6_ref[:], b6_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        tiled = pl.pallas_call(
            k_tiled,
            grid=(M // bm, N // bn),
            in_specs=[pl.BlockSpec((bm, 6 * K), lambda i, j: (i, 0)),
                      pl.BlockSpec((6 * K, bn), lambda i, j: (0, j))],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024))

        def tiled_step(x6, y6, tiled=tiled):
            o = tiled(x6, y6)
            return x6 + (jnp.sum(o) * 1e-30).astype(jnp.bfloat16)

        _time(tiled_step, a6, b6, label=f"pure_dot_tiled_{bm}x{bn}x6K")


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
