"""Batched GEMM: (B, M, K) x (B, K, N) -> (B, M, N).

The reference has no batched GEMM (its batch story is transpose2D_batched,
swapaxes.nim:56-84); BASELINE.json's config list names "bf16 4096^3 batched
GEMM" as a target workload, so this is the MXU analog: the flagship kernel
with a leading batch grid dimension (batch index prepended to every index
map, exactly how transpose.py batches its tile kernel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import get_config, should_interpret
from ...registry import build_cache
from ...utils import cdiv
from .api import _acc_dtype, _dispatch
from .tiling import GemmTiles, plan_tiles


@build_cache
def _build_batched(B: int, M: int, N: int, K: int, bm: int, bn: int, bk: int,
                   in_dtype: str, out_dtype: str, acc_dtype: str,
                   precision: str, interpret: bool, vmem_limit: int):
    acc_dt = jnp.dtype(acc_dtype)
    out_dt = jnp.dtype(out_dtype)
    is_int = jnp.issubdtype(acc_dt, jnp.integer)
    prec = ({"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[precision]
            if jnp.dtype(in_dtype) == jnp.float32 else None)
    grid = (B, cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    nk = grid[3]
    k_tail = K % bk != 0

    def kernel(a_ref, b_ref, out_ref, acc_ref):
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[0]
        b = b_ref[0]
        if k_tail:
            kk = k * bk + jax.lax.broadcasted_iota(jnp.int32, (bm, bk), 1)
            a = jnp.where(kk < K, a, 0)
            kk_b = k * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, bn), 0)
            b = jnp.where(kk_b < K, b, 0)
        acc_ref[:] += jnp.dot(a, b, preferred_element_type=acc_dt,
                              precision=None if is_int else prec)

        @pl.when(k == nk - 1)
        def _():
            out_ref[0] = acc_ref[:].astype(out_dt)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda b, i, j, k: (b, i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn), lambda b, i, j, k: (b, k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda b, i, j, k: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, N), out_dt),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * N * K,
            bytes_accessed=B * ((M * K + K * N) * jnp.dtype(in_dtype).itemsize
                                + M * N * out_dt.itemsize),
            transcendentals=0),
        interpret=interpret,
    )


def gemm_batched(a: jax.Array, b: jax.Array, *, out_dtype=None, acc_dtype=None,
                 tiles: Optional[GemmTiles] = None,
                 interpret: Optional[bool] = None) -> jax.Array:
    """C[b] = A[b] @ B[b] for every batch entry, one Pallas kernel."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != 3 or b.ndim != 3 or a.shape[0] != b.shape[0] \
            or a.shape[2] != b.shape[1]:
        raise ValueError(f"gemm_batched shapes: {a.shape} x {b.shape}")
    B, M, K = a.shape
    _, _, N = b.shape
    in_dtype = jnp.result_type(a.dtype, b.dtype)
    if _dispatch(in_dtype) != "mxu":
        r = jax.lax.dot_general(
            a.astype(in_dtype), b.astype(in_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.dtype(acc_dtype) if acc_dtype
            else _acc_dtype(in_dtype))
        return r.astype(out_dtype) if out_dtype else r
    acc_dt = jnp.dtype(acc_dtype) if acc_dtype else _acc_dtype(in_dtype)
    # integer inputs default to the accumulator dtype (matching api.gemm):
    # casting an int32 accumulator back to int8 would silently wrap
    out_dt = (jnp.dtype(out_dtype) if out_dtype
              else acc_dt if jnp.issubdtype(jnp.dtype(in_dtype), jnp.integer)
              else jnp.dtype(in_dtype))
    tiles = tiles or plan_tiles(M, N, K, in_dtype, acc_dt)
    interp = should_interpret() if interpret is None else interpret
    call = _build_batched(B, M, N, K, tiles.bm, tiles.bn, tiles.bk,
                          jnp.dtype(in_dtype).name, out_dt.name, acc_dt.name,
                          get_config().matmul_precision, interp,
                          tiles.vmem_limit_bytes)
    return call(a.astype(in_dtype), b.astype(in_dtype))
