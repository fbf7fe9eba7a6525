"""Native int32 GEMM on the MXU — exact wraparound (mod 2^32) semantics.

Parity component for the reference's integer microkernels
(laser/primitives/matrix_multiplication/gemm_ukernel_avx512.nim:40-74 int32x16,
gemm_ukernel_sse2.nim:67-120 int32 via 2-wide GPR "vectors"), whose headline
is "no vendor BLAS does integer GEMM" with C-like wraparound (mullo)
multiply semantics.

The TPU has no int32 multiplier in the MXU, but it has a fast int8 path
(int8 x int8 -> int32 accumulate). This kernel gets *exact* mod-2^32 int32
products out of it with a signed-digit base-256 limb decomposition:

    x = d0 + d1*2^8 + d2*2^16 + d3*2^24   (mod 2^32),  d_i in [-128, 127]

    A.B = sum_{i+j<=3} (A_i @ B_j) << 8(i+j)           (mod 2^32)

Terms with i+j >= 4 carry a 2^32 factor and vanish mod 2^32, leaving 10
int8 MXU matmuls per tile — an effective int32 ceiling of int8_peak/10
(~39 TOP/s on v5e, vs the reference's 27.9 GINTOP/s on 18 AVX512 cores).
Every intermediate (int8 products, int32 accumulation, the final shifts and
adds) is exact arithmetic mod 2^32, so the result matches the reference's
mullo semantics bit-for-bit, overflow included.

The digit decomposition runs once per operand as a streaming XLA pass
(int32 -> (4, ., .) int8 planes: identical HBM byte volume), not per grid
step — the analog of the reference packing A/B panels once per kc iteration
(gemm_packing.nim:24-94).

uint32 rides the same kernel via bitcast: multiplication mod 2^32 is
sign-agnostic on the bit level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...registry import build_cache
from ...utils import cdiv

_N_LIMBS = 4


def int32_limbs(x: jax.Array) -> jax.Array:
    """(..., R, C) int32 -> (4, ..., R, C) int8 signed-digit base-256 limbs.

    sum_i limbs[i] * 2^(8i) == x (mod 2^32); each limb is in [-128, 127].
    The recurrence x_{i+1} = (x_i - d_i) >> 8 stays exact mod 2^32 even when
    the subtraction wraps: (x - d) has zero low byte as a residue, so the
    arithmetic shift is an exact division by 256 in Z/2^32.
    """
    ls = []
    for _ in range(_N_LIMBS - 1):
        d = ((x + 128) & 255) - 128
        ls.append(d.astype(jnp.int8))
        x = (x - d) >> 8
    ls.append((((x + 128) & 255) - 128).astype(jnp.int8))
    return jnp.stack(ls)


@build_cache
def build_gemm_int32(M: int, N: int, K: int, bm: int, bn: int, bk: int,
                     has_c: bool, interpret: bool, vmem_limit: int):
    """Build f(alpha, beta, a_limbs, b_limbs, [c]) -> (M, N) int32.

    a_limbs: (4, M, K) int8, b_limbs: (4, K, N) int8 (from ``int32_limbs``).
    out = alpha * (A @ B) + beta * C with every operation mod 2^32.
    """
    bm = min(bm, _align(M))
    bn = min(bn, _align(N))
    bk = min(bk, _align(K))
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    nk = grid[2]
    k_tail = K % bk != 0

    def kernel(alpha_ref, beta_ref, a_ref, b_ref, *rest):
        acc_ref = rest[-1]
        out_ref = rest[-2]
        c_ref = rest[0] if has_c else None
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:]  # (4, bm, bk) int8
        b = b_ref[:]  # (4, bk, bn) int8
        if k_tail:
            kk = k * bk + jax.lax.broadcasted_iota(
                jnp.int32, (_N_LIMBS, bm, bk), 2)
            a = jnp.where(kk < K, a, 0)
            kk_b = k * bk + jax.lax.broadcasted_iota(
                jnp.int32, (_N_LIMBS, bk, bn), 1)
            b = jnp.where(kk_b < K, b, 0)

        dims = (((1,), (0,)), ((), ()))
        for s in range(_N_LIMBS):
            p = None
            for i in range(s + 1):
                q = jax.lax.dot_general(a[i], b[s - i], dims,
                                        preferred_element_type=jnp.int32)
                p = q if p is None else p + q
            acc_ref[:] += p << (8 * s)

        @pl.when(k == nk - 1)
        def _epilogue():
            r = acc_ref[:] * alpha_ref[0]
            if has_c:
                r = r + beta_ref[0] * c_ref[:]
            out_ref[:] = r

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1,)
        pl.BlockSpec((_N_LIMBS, bm, bk), lambda i, j, k: (0, i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_N_LIMBS, bk, bn), lambda i, j, k: (0, k, j),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                     memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 10 * M * N * K,
            bytes_accessed=4 * (M * K + K * N + M * N),
            transcendentals=0),
        interpret=interpret,
    )

    def fn(alpha, beta, a_limbs, b_limbs, c=None):
        args = [jnp.asarray([alpha], jnp.int32),
                jnp.asarray([beta], jnp.int32), a_limbs, b_limbs]
        if has_c:
            args.append(c)
        return call(*args)

    return fn


def gemm_int32(a: jax.Array, b: jax.Array, *, alpha: int = 1, beta: int = 0,
               c=None, tiles=None, interpret: bool = False) -> jax.Array:
    """alpha * (a @ b) + beta * c, exact mod 2^32 (int32 in, int32 out)."""
    M, K = a.shape
    N = b.shape[1]
    was_uint = a.dtype == jnp.uint32
    if was_uint:
        a = jax.lax.bitcast_convert_type(a, jnp.int32)
        b = jax.lax.bitcast_convert_type(b, jnp.int32)
        if c is not None:
            c = jax.lax.bitcast_convert_type(c, jnp.int32)
    # Mosaic's int8 tiling is (32, 128); zero-pad up front (zero limbs are
    # zero digits — products contribute nothing mod 2^32, so padding is
    # exact). Large matrices are already aligned and pay nothing.
    Mp = _pad_to(M, 32)
    Kp = _pad_to(K, 128)
    Np = _pad_to(N, 128)
    if (Mp, Kp, Np) != (M, K, N):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
        if c is not None:
            c = jnp.pad(c, ((0, Mp - M), (0, Np - N)))
    from .tiling import plan_tiles

    t = tiles or plan_tiles(Mp, Np, Kp, jnp.int32, jnp.int32,
                            has_c_input=c is not None)
    fn = build_gemm_int32(Mp, Np, Kp, t.bm, t.bn, t.bk, c is not None,
                          interpret, t.vmem_limit_bytes)
    out = fn(alpha, beta, int32_limbs(a), int32_limbs(b), c)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    if was_uint:
        out = jax.lax.bitcast_convert_type(out, jnp.uint32)
    return out


def _pad_to(x: int, step: int) -> int:
    return ((x + step - 1) // step) * step


def _align(x: int, align: int = 128) -> int:
    return max(align, ((x + align - 1) // align) * align)
