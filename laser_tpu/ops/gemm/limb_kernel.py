"""Shared limb-product GEMM kernel: bucketed int8-digit matmuls on the MXU.

Substrate for the wide-dtype native GEMMs — int64 (mod-2^64 wraparound
parity with the reference's int64 microkernels,
laser/primitives/matrix_multiplication/gemm_ukernel_avx512.nim:58-74 int64x8,
gemm_ukernel_sse2.nim:67-120) and float64 (parity with the reference's f64
ukernels, gemm_ukernel_avx512.nim:23-38; Ozaki-style slicing) — on hardware
whose only wide-accumulator multiplier is the int8 -> int32 MXU path.

Both decompose each operand into ``n`` int8 digit planes

    x = sum_p d_p * B^(w_p)        (B = 2^8 for int64, 2^-7 scaling for f64)

so the product becomes a sum over digit pairs (p, q), grouped by bucket
s = p + q:

    S_s = sum_{p+q=s} A_p @ B_q    (int8 x int8 -> int32, exact)

This kernel computes the ``S_s`` planes for all s < n_buckets in one pass:
grid (M/bm, N/bn, K/bk), K innermost, one int32 VMEM accumulator stack of
shape (n_buckets, bm, bn). The caller recombines the planes into the target
dtype (an O(M*N) elementwise pass — the analog of the reference's epilogue).

Exactness: each digit product |d_p * d_q| <= 2^14, each bucket sums at most
``n`` pairs, so |S_s| <= n * K * 2^14; callers must chunk K to keep that
under 2^31 (the int32 accumulator) — see ``max_k_for``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...device_info import vmem_budget_bytes
from ...registry import build_cache
from ...utils import cdiv, round_step_up


def max_k_for(n_limbs: int, digit_max: int = 128) -> int:
    """Largest K whose bucket sums provably fit an int32 accumulator."""
    # |S_s| <= n_limbs * K * digit_max^2; keep a 2x safety margin.
    return int(2**30 // (n_limbs * digit_max * digit_max))


def plan_limb_tiles(M: int, N: int, K: int, n_limbs: int, n_buckets: int):
    """(bm, bn, bk) for the limb kernel: the VMEM bill has ``n_limbs`` input
    planes per operand and ``n_buckets`` int32 accumulator/output planes."""
    budget = vmem_budget_bytes()

    def fit(bm, bn, bk):
        inputs = 2 * n_limbs * (bm * bk + bk * bn)  # double-buffered int8
        acc = n_buckets * bm * bn * 4
        out = 2 * n_buckets * bm * bn * 4
        return inputs + acc + out <= budget

    Mr = round_step_up(max(M, 1), 128)
    Nr = round_step_up(max(N, 1), 128)
    Kr = round_step_up(max(K, 1), 128)
    bm = min(256, Mr)
    bn = min(256, Nr)
    bk = min(2048, Kr)
    while bk > 128 and not fit(bm, bn, bk):
        bk -= 128
    while not fit(bm, bn, bk) and (bm > 128 or bn > 128):
        if bn >= bm and bn > 128:
            bn -= 128
        elif bm > 128:
            bm -= 128
    return bm, bn, bk


@build_cache
def build_gemm_limbs(M: int, N: int, K: int, n_limbs_a: int, n_limbs_b: int,
                     n_buckets: int, bm: int, bn: int, bk: int,
                     interpret: bool, vmem_limit: int):
    """Build f(a_digits, b_digits) -> (n_buckets, M, N) int32 bucket planes.

    a_digits: (n_limbs_a, M, K) int8; b_digits: (n_limbs_b, K, N) int8.
    out[s] = sum_{p+q=s, p<n_limbs_a, q<n_limbs_b} a[p] @ b[q]  (int32 exact).
    """
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    nk = grid[2]
    k_tail = K % bk != 0
    pairs_by_bucket = [
        [(p, s - p) for p in range(n_limbs_a)
         if 0 <= s - p < n_limbs_b]
        for s in range(n_buckets)
    ]
    n_dots = sum(len(ps) for ps in pairs_by_bucket)

    def kernel(a_ref, b_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:]  # (n_limbs_a, bm, bk) int8
        b = b_ref[:]  # (n_limbs_b, bk, bn) int8
        if k_tail:
            kk = k * bk + jax.lax.broadcasted_iota(
                jnp.int32, (n_limbs_a, bm, bk), 2)
            a = jnp.where(kk < K, a, 0)
            kk_b = k * bk + jax.lax.broadcasted_iota(
                jnp.int32, (n_limbs_b, bk, bn), 1)
            b = jnp.where(kk_b < K, b, 0)

        dims = (((1,), (0,)), ((), ()))
        for s, pairs in enumerate(pairs_by_bucket):
            if not pairs:
                continue
            p0, q0 = pairs[0]
            acc = jax.lax.dot_general(a[p0], b[q0], dims,
                                      preferred_element_type=jnp.int32)
            for p, q in pairs[1:]:
                acc += jax.lax.dot_general(a[p], b[q], dims,
                                           preferred_element_type=jnp.int32)
            acc_ref[s] += acc

        @pl.when(k == nk - 1)
        def _epilogue():
            out_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # i * 0 (not the literal 0): under jax_enable_x64 a Python-int
            # leading index traces as i64, which Mosaic cannot lower.
            pl.BlockSpec((n_limbs_a, bm, bk), lambda i, j, k: (i * 0, i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_limbs_b, bk, bn), lambda i, j, k: (i * 0, k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_buckets, bm, bn),
                               lambda i, j, k: (i * 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_buckets, M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_buckets, bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_dots * M * N * K,
            bytes_accessed=(n_limbs_a * M * K + n_limbs_b * K * N
                            + 4 * n_buckets * M * N),
            transcendentals=0),
        interpret=interpret,
    )
    return call


def gemm_limbs(a_digits: jax.Array, b_digits: jax.Array, n_buckets: int,
               *, interpret: bool = False) -> jax.Array:
    """Bucket planes for pre-decomposed operands (shapes already padded to
    Mosaic's int8 tiling: M % 32 == 0 and K, N % 128 == 0)."""
    nA, M, K = a_digits.shape
    nB, _, N = b_digits.shape
    bm, bn, bk = plan_limb_tiles(M, N, K, max(nA, nB), n_buckets)
    vmem_limit = vmem_budget_bytes(1.0)
    fn = build_gemm_limbs(M, N, K, nA, nB, n_buckets, bm, bn, bk,
                          interpret, vmem_limit)
    return fn(a_digits, b_digits)
