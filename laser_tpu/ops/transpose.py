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
                donate: bool = False,
                interpret: Optional[bool] = None) -> jax.Array:
    """(R, C) -> (C, R) (reference: transpose2D_copy, swapaxes.nim:16-54).

    ``donate=True`` on a square array runs the in-place paired-swap kernel
    (each grid step swap-transposes the (i,j)/(j,i) block pair through VMEM
    with manual DMA, whole buffer aliased): ~1.7x the out-of-place bandwidth
    on v5e since out-of-place HBM streams serialize reads against writes
    (docs/PERF_NOTES.md). The donated input must not be reused.
    """
    x = jnp.asarray(x)
    interp = should_interpret() if interpret is None else interpret
    R, C = x.shape
    if donate and R == C and not interp:
        for t in (512, 256, 128):
            if R % t == 0:
                return _build_inplace_transpose_pipelined(
                    R, t, jnp.dtype(x.dtype).name)(x)
    return transpose2d_batched(x[None], tile=tile, interpret=interpret)[0]


@build_cache
def _build_inplace_transpose(N: int, T: int, dtype: str):
    """Square in-place transpose: 1D grid over upper-triangle block pairs."""
    dt = jnp.dtype(dtype)
    nt = N // T
    P = nt * (nt + 1) // 2

    def kern(x_hbm, o_hbm):
        p = pl.program_id(0)
        # Invert the triangular index p -> (i, j_off); fp sqrt + integer
        # correction keeps it exact for any realistic block count.
        pf = p.astype(jnp.float32)
        i = jnp.floor((jnp.sqrt(8.0 * pf + 1.0) - 1.0) / 2.0).astype(jnp.int32)
        i = jnp.where((i + 1) * (i + 2) // 2 <= p, i + 1, i)
        i = jnp.where(i * (i + 1) // 2 > p, i - 1, i)
        row = p - i * (i + 1) // 2
        col = i

        def body(b1, b2, sem):
            d1 = pltpu.make_async_copy(
                x_hbm.at[pl.ds(row * T, T), pl.ds(col * T, T)], b1, sem.at[0])
            d2 = pltpu.make_async_copy(
                x_hbm.at[pl.ds(col * T, T), pl.ds(row * T, T)], b2, sem.at[1])
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()
            b1t = jnp.swapaxes(b1[...], 0, 1)
            b2t = jnp.swapaxes(b2[...], 0, 1)
            b1[...] = b2t
            b2[...] = b1t
            w1 = pltpu.make_async_copy(
                b1, o_hbm.at[pl.ds(row * T, T), pl.ds(col * T, T)], sem.at[0])
            w2 = pltpu.make_async_copy(
                b2, o_hbm.at[pl.ds(col * T, T), pl.ds(row * T, T)], sem.at[1])
            w1.start()
            w2.start()
            w1.wait()
            w2.wait()

        pl.run_scoped(body,
                      b1=pltpu.VMEM((T, T), dt),
                      b2=pltpu.VMEM((T, T), dt),
                      sem=pltpu.SemaphoreType.DMA((2,)))

    return pl.pallas_call(
        kern,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N), dt),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@build_cache
def _build_inplace_transpose_pipelined(N: int, T: int, dtype: str,
                                        interpret: bool = False):
    """Square in-place transpose, software-pipelined double buffering.

    The plain in-place kernel (_build_inplace_transpose) fully serializes
    each step: load pair -> wait -> swap -> store pair -> wait, so HBM sits
    idle during compute and compute sits idle during DMA (measured 497 GB/s
    = 61% of HBM on 8192^2 f32). Here each parity slot owns a pair of VMEM
    buffers and the NEXT pair's loads are issued while the current pair is
    being swapped, so the DMA engines stream continuously — the hand-rolled
    version of the Mosaic block pipeline that in-place aliasing forbids
    (reference behavior target: swapaxes.nim:16-54 "HBM-bandwidth bound").

    Diagonal steps (r == c) move ONE tile, not two: the naive pair scheme
    loads and stores x[r,r] twice, wasting 1/(nt+1) of all HBM traffic
    (5.9% at 8192/512) — every second DMA is issued only when r != c, and
    the swap writes transpose(b1) into b1 on the diagonal.
    """
    dt = jnp.dtype(dtype)
    nt = N // T
    P = nt * (nt + 1) // 2

    def kern(x_hbm, o_hbm, b1, b2, lsem, ssem):
        p = pl.program_id(0)
        q = jax.lax.rem(p, 2)

        def rc(step):
            pf = step.astype(jnp.float32)
            i = jnp.floor((jnp.sqrt(8.0 * pf + 1.0) - 1.0) / 2.0
                          ).astype(jnp.int32)
            i = jnp.where((i + 1) * (i + 2) // 2 <= step, i + 1, i)
            i = jnp.where(i * (i + 1) // 2 > step, i - 1, i)
            return step - i * (i + 1) // 2, i

        def load_descs(step, slot):
            r, c = rc(step)
            return (pltpu.make_async_copy(
                        x_hbm.at[pl.ds(r * T, T), pl.ds(c * T, T)],
                        b1.at[slot], lsem.at[slot, 0]),
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds(c * T, T), pl.ds(r * T, T)],
                        b2.at[slot], lsem.at[slot, 1]))

        def store_descs(step, slot):
            r, c = rc(step)
            return (pltpu.make_async_copy(
                        b1.at[slot],
                        o_hbm.at[pl.ds(r * T, T), pl.ds(c * T, T)],
                        ssem.at[slot, 0]),
                    pltpu.make_async_copy(
                        b2.at[slot],
                        o_hbm.at[pl.ds(c * T, T), pl.ds(r * T, T)],
                        ssem.at[slot, 1]))

        def off_diag(step):
            r, c = rc(step)
            return r != c

        def start_loads(step, slot):
            d1, d2 = load_descs(step, slot)
            d1.start()

            @pl.when(off_diag(step))
            def _():
                d2.start()

        def start_stores(step, slot):
            w1, w2 = store_descs(step, slot)
            w1.start()

            @pl.when(off_diag(step))
            def _():
                w2.start()

        def wait_stores(step, slot):
            w1, w2 = store_descs(step, slot)
            w1.wait()

            @pl.when(off_diag(step))
            def _():
                w2.wait()

        @pl.when(p == 0)
        def _first_load():
            start_loads(p, q)

        @pl.when(p + 1 < P)
        def _prefetch_next():
            # slot 1-q is free once step p-1's stores land; then its loads
            # stream during THIS step's swap/compute
            @pl.when(p >= 1)
            def _():
                wait_stores(p - 1, 1 - q)
            start_loads(p + 1, 1 - q)

        d1, d2 = load_descs(p, q)
        diag = ~off_diag(p)
        d1.wait()

        @pl.when(~diag)
        def _():
            d2.wait()

        b1t = jnp.swapaxes(b1[q], 0, 1)
        b2t = jnp.swapaxes(b2[q], 0, 1)
        # diagonal: o[r,r] = transpose(x[r,r]) = b1t; b2 is stale, unstored
        b1[q] = jnp.where(diag, b1t, b2t)
        b2[q] = b1t
        start_stores(p, q)

        @pl.when(p == P - 1)
        def _drain():
            wait_stores(p, q)

            @pl.when(p >= 1)
            def _():
                # the last step never ran the prefetch branch, so step
                # p-1's stores are still in flight
                wait_stores(p - 1, 1 - q)

    return pl.pallas_call(
        kern,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N), dt),
        input_output_aliases={0: 0},
        scratch_shapes=[pltpu.VMEM((2, T, T), dt), pltpu.VMEM((2, T, T), dt),
                        pltpu.SemaphoreType.DMA((2, 2)),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def nchw2nhwc(x: jax.Array, **kw) -> jax.Array:
    """(N,C,H,W) -> (N,H,W,C) as a batched (C, H*W) transpose
    (reference: swapaxes.nim:86-98)."""
    N, C, H, W = x.shape
    return transpose2d_batched(x.reshape(N, C, H * W), **kw).reshape(N, H, W, C)


def nhwc2nchw(x: jax.Array, **kw) -> jax.Array:
    """(N,H,W,C) -> (N,C,H,W) (reference: swapaxes.nim:100-112)."""
    N, H, W, C = x.shape
    return transpose2d_batched(x.reshape(N, H * W, C), **kw).reshape(N, C, H, W)
