"""Prepacked GEMM: pack once, multiply many times.

Rebuild of the reference's prepacked API
(laser/primitives/matrix_multiplication/gemm_prepacked.nim:63-292):
``gemm_prepackA/B`` reorder a matrix into the microkernel's panel layout up
front so repeated GEMMs skip the packing stage. The TPU-native packed layout
is a *pre-blocked, pre-padded, pre-cast* 4D array

    packed A: (ceil(M/bm), ceil(K/bk), bm, bk)
    packed B: (ceil(K/bk), ceil(N/bn), bk, bn)

so every kernel block read is a single fully-contiguous VMEM copy with no
edge masking at all (zero padding makes tail blocks mathematically inert).
Like the reference's layout (gemm_prepacked.nim:120-123), the packed form is
**machine- and config-specific — never serialize it**: it bakes in the tile
plan, dtype cast, and the device layout of this process.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import get_config, should_interpret
from ...registry import build_cache
from ...utils import round_step_up
from .tiling import GemmTiles, plan_tiles


@dataclasses.dataclass(frozen=True)
class PackedMatrix:
    """Opaque packed operand (do not serialize; see module docstring)."""

    data: jax.Array  # 4D blocked layout
    rows: int  # logical (unpadded) rows
    cols: int  # logical cols
    block: tuple  # (block_rows, block_cols)
    operand: str  # "A" or "B"

    @property
    def grid_shape(self):
        return self.data.shape[:2]


def _pack(x: jax.Array, br: int, bc: int, operand: str) -> PackedMatrix:
    r, c = x.shape
    rp, cp = round_step_up(r, br), round_step_up(c, bc)
    if (rp, cp) != (r, c):
        x = jnp.pad(x, ((0, rp - r), (0, cp - c)))
    blocked = x.reshape(rp // br, br, cp // bc, bc).transpose(0, 2, 1, 3)
    return PackedMatrix(blocked, r, c, (br, bc), operand)


def gemm_prepack_a(a: jax.Array, *, tiles: Optional[GemmTiles] = None,
                   n_hint: int = 1024, dtype=None) -> PackedMatrix:
    """gemm_prepackA analog (gemm_prepacked.nim:168-218). ``n_hint`` is the
    expected N of future multiplies, used only for tile planning."""
    a = jnp.asarray(a, dtype)
    M, K = a.shape
    tiles = tiles or plan_tiles(M, n_hint, K, a.dtype)
    return _pack(a, tiles.bm, tiles.bk, "A")


def gemm_prepack_b(b: jax.Array, *, tiles: Optional[GemmTiles] = None,
                   m_hint: int = 1024, dtype=None) -> PackedMatrix:
    """gemm_prepackB analog (gemm_prepacked.nim:87-135)."""
    b = jnp.asarray(b, dtype)
    K, N = b.shape
    tiles = tiles or plan_tiles(m_hint, N, K, b.dtype)
    return _pack(b, tiles.bk, tiles.bn, "B")


@build_cache
def _build_packed_gemm(gm: int, gn: int, gk: int, bm: int, bn: int, bk: int,
                       in_dtype: str, out_dtype: str, acc_dtype: str,
                       has_c: bool, precision: str, interpret: bool):
    """Kernel over pre-blocked operands: no tails anywhere by construction."""
    acc_dt = jnp.dtype(acc_dtype)
    out_dt = jnp.dtype(out_dtype)
    is_int = jnp.issubdtype(acc_dt, jnp.integer)
    prec = ({"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[precision]
            if jnp.dtype(in_dtype) == jnp.float32 else None)

    def kernel(alpha_ref, beta_ref, a_ref, b_ref, *rest):
        acc_ref = rest[-1]
        out_ref = rest[-2]
        c_ref = rest[0] if has_c else None
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(a_ref[0, 0], b_ref[0, 0],
                              preferred_element_type=acc_dt,
                              precision=None if is_int else prec)

        @pl.when(k == gk - 1)
        def _fin():
            r = acc_ref[:] * alpha_ref[0]
            if has_c:
                r = r + beta_ref[0] * c_ref[:].astype(acc_dt)
            out_ref[:] = r.astype(out_dt)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, bm, bk), lambda i, j, k: (i, k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, bn), lambda i, j, k: (k, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                     memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gm * bm, gn * bn), out_dt),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * gm * bm * gn * bn * gk * bk,
            bytes_accessed=(gm * bm * gk * bk + gk * bk * gn * bn)
            * jnp.dtype(in_dtype).itemsize + gm * bm * gn * bn * out_dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def gemm_packed(alpha, packed_a: PackedMatrix, packed_b: PackedMatrix, beta=0.0,
                c: Optional[jax.Array] = None, *, out_dtype=None,
                acc_dtype=None, interpret: Optional[bool] = None) -> jax.Array:
    """gemm_packed analog (gemm_prepacked.nim:226-292): multiply two packed
    operands, returning the (M,N) result."""
    from .api import _acc_dtype

    if packed_a.operand != "A" or packed_b.operand != "B":
        raise ValueError("need (packed A, packed B)")
    if packed_a.cols != packed_b.rows:
        raise ValueError(f"K mismatch: {packed_a.cols} vs {packed_b.rows}")
    if packed_a.block[1] != packed_b.block[0]:
        raise ValueError("pack tile plans disagree on bk; pack with the same GemmTiles")
    M, K, N = packed_a.rows, packed_a.cols, packed_b.cols
    bm, bk = packed_a.block
    _, bn = packed_b.block
    gm, gk = packed_a.grid_shape
    _, gn = packed_b.grid_shape

    in_dt = jnp.result_type(packed_a.data.dtype, packed_b.data.dtype)
    acc_dt = jnp.dtype(acc_dtype) if acc_dtype else _acc_dtype(in_dt)
    out_dt = jnp.dtype(out_dtype) if out_dtype else (
        jnp.dtype(in_dt) if not jnp.issubdtype(jnp.dtype(in_dt), jnp.integer)
        else acc_dt)
    interp = should_interpret() if interpret is None else interpret
    has_c = c is not None

    call = _build_packed_gemm(gm, gn, gk, bm, bn, bk, jnp.dtype(in_dt).name,
                              out_dt.name, acc_dt.name, has_c,
                              get_config().matmul_precision, interp)
    args = [jnp.asarray([alpha], acc_dt), jnp.asarray([beta], acc_dt),
            packed_a.data.astype(in_dt), packed_b.data.astype(in_dt)]
    if has_c:
        cpad = jnp.pad(jnp.asarray(c), ((0, gm * bm - M), (0, gn * bn - N)))
        args.append(cpad)
    out = call(*args)
    return out[:M, :N]
