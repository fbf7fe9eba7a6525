"""Pallas MXU matmul kernel builder — the flagship kernel.

Rebuild of the reference's BLIS-style GEMM engine
(laser/primitives/matrix_multiplication/gemm.nim:48-176 +
gemm_ukernel_generator.nim:103-250). The mapping, loop by loop:

  reference (CPU/OpenMP)                     here (TPU/Pallas)
  -------------------------------------      --------------------------------
  kc loop streaming B panels (gemm.nim:150)  grid dim 2 (k, "arbitrary")
  ic loop / omp_for over A panels (:163)     grid dim 0 (i, "parallel")
  jr taskloop over B slivers (:74)           grid dim 1 (j, "parallel")
  pack_A/pack_B into L1/L2 buffers           Mosaic double-buffered HBM->VMEM
                                             block pipeline (BlockSpec)
  MRxNR register accumulator tile            (bm,bn) f32 VMEM scratch
  gebb ukernel broadcast+FMA loop            jnp.dot -> one MXU issue per
                                             (bm,bk)x(bk,bn) step
  SIMD alpha/beta epilogue (:72-99)          VPU epilogue on the final k step
  edge ukernel w/ partial tiles (:95-101)    K-tail masking in-kernel; M/N
                                             tails via Pallas masked stores
  fused activation (roadmap, README:238)     implemented: relu/tanh/sigmoid/
                                             gelu/bias epilogues

alpha/beta ride in SMEM as (1,1) scalars so changing them never retraces
(the reference passes them as runtime proc args for the same reason).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...registry import build_cache
from ...utils import cdiv

_EPILOGUES = {
    None: lambda r: r,
    "none": lambda r: r,
    "relu": lambda r: jnp.maximum(r, 0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
}


def epilogue_names():
    return [k for k in _EPILOGUES if k]


def _precision(name: str):
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[name]


@build_cache
def build_gemm(M: int, N: int, K: int, bm: int, bn: int, bk: int,
               in_dtype: str, out_dtype: str, acc_dtype: str,
               has_c: bool, has_bias: bool, epilogue: Optional[str],
               precision: str, interpret: bool, vmem_limit: int,
               trans_a: bool = False, trans_b: bool = False):
    """Build a jitted f(alpha, beta, a, b, [c], [bias]) -> (M,N) out.

    a: (M,K) in_dtype (or (K,M) when trans_a), b: (K,N) (or (N,K) when
    trans_b), c: (M,N) (when beta != 0), bias: (1,N). Transposed operands
    are contracted in place by the MXU (dot_general dimension numbers) — no
    HBM transpose materialization, the fast path for the reference's
    col-major/strided scenarios (README.md:211-213). All dims may be
    non-multiples of the block sizes: M/N tails rely on Pallas masked
    stores; the K tail is masked in-kernel (both A and B sides, so
    uninitialized pad lanes can never poison the accumulator — the analog of
    the reference's edge ukernel, gemm.nim:95-101).
    """
    bm, bn, bk = min(bm, _ceil_align(M)), min(bn, _ceil_align(N)), min(bk, _ceil_align(K))
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    nk = grid[2]
    k_tail = K % bk != 0
    acc_dt = jnp.dtype(acc_dtype)
    out_dt = jnp.dtype(out_dtype)
    act = _EPILOGUES[epilogue]
    is_int = jnp.issubdtype(acc_dt, jnp.integer)
    # The precision knob only applies to f32 inputs (it selects the 1/3/6-pass
    # bf16 decomposition on the MXU); bf16/int inputs have a single native path.
    prec = _precision(precision) if jnp.dtype(in_dtype) == jnp.float32 else None

    def kernel(alpha_ref, beta_ref, a_ref, b_ref, *rest):
        acc_ref = rest[-1]
        out_ref = rest[-2]
        c_ref = rest[0] if has_c else None
        bias_ref = rest[1 if has_c else 0] if has_bias else None

        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:]
        b = b_ref[:]
        a_shape = (bk, bm) if trans_a else (bm, bk)
        b_shape = (bn, bk) if trans_b else (bk, bn)
        if k_tail:
            # Zero the out-of-range K lanes on BOTH operands: 0*garbage can be
            # NaN, so each side must be cleaned before the dot.
            kk = k * bk + jax.lax.broadcasted_iota(
                jnp.int32, a_shape, 0 if trans_a else 1)
            a = jnp.where(kk < K, a, 0)
            kk_b = k * bk + jax.lax.broadcasted_iota(
                jnp.int32, b_shape, 1 if trans_b else 0)
            b = jnp.where(kk_b < K, b, 0)
        dims = (((0,) if trans_a else (1,), (1,) if trans_b else (0,)),
                ((), ()))
        acc_ref[:] += jax.lax.dot_general(
            a, b, dims, preferred_element_type=acc_dt,
            precision=None if is_int else prec)

        @pl.when(k == nk - 1)
        def _epilogue():
            alpha = alpha_ref[0]
            beta = beta_ref[0]
            r = acc_ref[:] * alpha
            if has_c:
                r = r + beta * c_ref[:].astype(acc_dt)
            if has_bias:
                r = r + bias_ref[:].astype(acc_dt)
            out_ref[:] = act(r).astype(out_dt)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1,)
        pl.BlockSpec((bk, bm), lambda i, j, k: (k, i), memory_space=pltpu.VMEM)
        if trans_a else
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM)
        if trans_b else
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                     memory_space=pltpu.VMEM))
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                     memory_space=pltpu.VMEM))

    itemsize = jnp.dtype(in_dtype).itemsize
    flops = 2 * M * N * K
    bytes_accessed = (M * K + K * N) * itemsize + M * N * out_dt.itemsize

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dt),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )

    def fn(alpha, beta, a, b, c=None, bias=None):
        args = [jnp.asarray([alpha], acc_dt) if np.isscalar(alpha) or getattr(alpha, "ndim", 1) == 0
                else alpha.reshape(1).astype(acc_dt),
                jnp.asarray([beta], acc_dt) if np.isscalar(beta) or getattr(beta, "ndim", 1) == 0
                else beta.reshape(1).astype(acc_dt),
                a, b]
        if has_c:
            args.append(c)
        if has_bias:
            args.append(bias.reshape(1, N))
        return call(*args)

    return fn


def _ceil_align(x: int, align: int = 128) -> int:
    return max(align, ((x + align - 1) // align) * align)
