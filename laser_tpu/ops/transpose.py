"""Tiled layout kernels: 2D transpose, batched transpose, NCHW<->NHWC.

Rebuild of the reference's swapaxes layer
(laser/primitives/swapaxes.nim:16-112): the 32x32 cache-blocked OpenMP+SIMD
transpose becomes a VMEM-tiled Pallas kernel — each grid step loads an
aligned (tr, tc) tile, transposes it in-registers on the VPU, and stores the
(tc, tr) tile contiguously ("scatters cheaper than gathers": we write dst
contiguously exactly like swapaxes.nim:33-39 chose to). Goal: HBM-bandwidth
bound. NCHW<->NHWC conversions reuse the batched kernel through an
(N, C, H*W) view, the same reduction the reference uses
(swapaxes.nim:86-112).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..device_info import min_tile
from ..registry import build_cache
from ..utils import cdiv, round_step_up


def _tile_for(dtype, rows: int, cols: int) -> Tuple[int, int]:
    """Square-ish VMEM tile, aligned to the dtype's native (sublane, lane)
    tile on BOTH axes since each axis is minor in one of src/dst."""
    sub, lane = min_tile(dtype)
    edge = max(lane, sub)
    t = 256 if np.dtype(dtype).itemsize <= 4 else 128
    tr = min(round_step_up(rows, edge), t)
    tc = min(round_step_up(cols, edge), t)
    return max(tr, edge), max(tc, edge)


@build_cache
def _build_transpose(B: int, R: int, C: int, tr: int, tc: int, dtype: str,
                     interpret: bool):
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], -1, -2)

    return pl.pallas_call(
        kernel,
        grid=(B, cdiv(R, tr), cdiv(C, tc)),
        in_specs=[pl.BlockSpec((1, tr, tc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tc, tr), lambda b, i, j: (b, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), jnp.dtype(dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )


def transpose2d_batched(x: jax.Array, *, tile: Optional[Tuple[int, int]] = None,
                        interpret: Optional[bool] = None) -> jax.Array:
    """(B, R, C) -> (B, C, R) (reference: transpose2D_batched, swapaxes.nim:56-84)."""
    x = jnp.asarray(x)
    B, R, C = x.shape
    tr, tc = tile or _tile_for(x.dtype, R, C)
    interp = should_interpret() if interpret is None else interpret
    return _build_transpose(B, R, C, tr, tc, jnp.dtype(x.dtype).name, interp)(x)


def transpose2d(x: jax.Array, *, tile: Optional[Tuple[int, int]] = None,
                interpret: Optional[bool] = None) -> jax.Array:
    """(R, C) -> (C, R) out-of-place (reference: transpose2D_copy, swapaxes.nim:16-54)."""
    x = jnp.asarray(x)
    return transpose2d_batched(x[None], tile=tile, interpret=interpret)[0]


def nchw2nhwc(x: jax.Array, **kw) -> jax.Array:
    """(N,C,H,W) -> (N,H,W,C) as a batched (C, H*W) transpose
    (reference: swapaxes.nim:86-98)."""
    N, C, H, W = x.shape
    return transpose2d_batched(x.reshape(N, C, H * W), **kw).reshape(N, H, W, C)


def nhwc2nchw(x: jax.Array, **kw) -> jax.Array:
    """(N,H,W,C) -> (N,C,H,W) (reference: swapaxes.nim:100-112)."""
    N, H, W, C = x.shape
    return transpose2d_batched(x.reshape(N, H * W, C), **kw).reshape(N, C, H, W)
