"""Native int64 GEMM on the MXU — exact wraparound (mod 2^64) semantics.

Parity component for the reference's int64 microkernels
(laser/primitives/matrix_multiplication/gemm_ukernel_avx512.nim:58-74 int64x8,
gemm_ukernel_sse2.nim:67-120 via GPR "vectors"), benchmarked at
19.8 GINTOP/s on 18 AVX512 cores (benchmarks/gemm/gemm_bench_int64.nim).

Same signed-digit base-256 decomposition as the int32 kernel
(int32_kernel.py), widened to 8 limbs:

    x = sum_{i<8} d_i * 2^(8i)   (mod 2^64),   d_i in [-128, 127]

    A.B = sum_{i+j<8} (A_i @ B_j) << 8(i+j)    (mod 2^64)

Terms with i+j >= 8 carry a 2^64 factor and vanish, leaving 36 int8 MXU
matmuls per tile. Unlike the int32 kernel — whose accumulator wraps mod 2^32
for free — the 64-bit combine needs cross-byte carries the 32-bit in-kernel
accumulator cannot hold, so the kernel (limb_kernel.py) emits the 8 exact
bucket planes S_s = sum_{i+j=s} A_i @ B_j and the combine

    out = sum_s int64(S_s) << 8s    (int64 adds/shifts wrap: exact mod 2^64)

runs as one XLA elementwise pass. Each bucket sums <= 8*K products of
magnitude <= 2^14, so K is chunked at 8192 per kernel call (chunk results
add exactly mod 2^64).

Requires ``jax_enable_x64`` (int64 arrays don't exist without it); uint64
rides the same kernel via bitcast, like uint32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import round_step_up
from .limb_kernel import gemm_limbs, max_k_for

_N_LIMBS = 8
_K_CHUNK = max_k_for(_N_LIMBS)  # 8192


def int64_limbs(x: jax.Array) -> jax.Array:
    """(..., R, C) int64 -> (8, ..., R, C) int8 signed-digit base-256 limbs.

    sum_i limbs[i] * 2^(8i) == x (mod 2^64). Same exact recurrence as
    ``int32_limbs``: (x - d) has a zero low byte, so the arithmetic shift is
    an exact division by 256 in Z/2^64.
    """
    ls = []
    for _ in range(_N_LIMBS - 1):
        d = ((x + 128) & 255) - 128
        ls.append(d.astype(jnp.int8))
        x = (x - d) >> 8
    ls.append((((x + 128) & 255) - 128).astype(jnp.int8))
    return jnp.stack(ls)


def _combine_mod64(buckets: jax.Array) -> jax.Array:
    """(8, M, N) int32 bucket planes -> (M, N) int64, exact mod 2^64."""
    out = buckets[0].astype(jnp.int64)
    for s in range(1, _N_LIMBS):
        out = out + (buckets[s].astype(jnp.int64) << (8 * s))
    return out


def gemm_int64(a: jax.Array, b: jax.Array, *, alpha: int = 1, beta: int = 0,
               c=None, interpret: bool = False) -> jax.Array:
    """alpha * (a @ b) + beta * c, exact mod 2^64 (int64 in, int64 out)."""
    M, K = a.shape
    N = b.shape[1]
    was_uint = a.dtype == jnp.uint64
    if was_uint:
        a = jax.lax.bitcast_convert_type(a, jnp.int64)
        b = jax.lax.bitcast_convert_type(b, jnp.int64)
        if c is not None:
            c = jax.lax.bitcast_convert_type(c, jnp.int64)
    # Mosaic int8 tiling is (32, 128); zero digits contribute nothing.
    Mp = round_step_up(M, 32)
    Kp = round_step_up(K, 128)
    Np = round_step_up(N, 128)
    if (Mp, Kp, Np) != (M, K, N):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))

    out = None
    for k0 in range(0, Kp, _K_CHUNK):
        k1 = min(k0 + _K_CHUNK, Kp)
        buckets = gemm_limbs(int64_limbs(a[:, k0:k1]),
                             int64_limbs(b[k0:k1, :]),
                             _N_LIMBS, interpret=interpret)
        part = _combine_mod64(buckets)
        out = part if out is None else out + part  # int64 add wraps: exact

    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    out = out * jnp.int64(alpha)
    if c is not None:
        out = out + jnp.int64(beta) * c
    if was_uint:
        out = jax.lax.bitcast_convert_type(out, jnp.uint64)
    return out


