"""Quantization kernels: f32/bf16 <-> int8 with optional stochastic rounding.

The reference's integer GEMMs exist because no vendor BLAS does int
(gemm_bench_int32.nim); on TPU the int8 MXU path is the idiomatic reason to
quantize (394 TOP/s vs 197 bf16 on v5e). This module completes that story:
per-tensor/per-row scales, a quantize kernel (with hardware stochastic
rounding on TPU — the unbiased choice for training), dequantize, and a
quantized GEMM that runs the int8 MXU kernel and rescales.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..registry import build_cache
from ..utils import cdiv, round_step_up

LANES = 128


@build_cache
def _build_quantize(rows: int, cols: int, br: int, per_row: bool,
                    stochastic: bool, dtype: str, interpret: bool):
    dt = jnp.dtype(dtype)

    def kernel(x_ref, seed_ref, scale_ref, q_ref):
        if stochastic and not interpret:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        v = x_ref[:].astype(jnp.float32)
        if per_row:
            amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        else:
            amax = jnp.max(jnp.abs(v))  # per-block; combined outside
        scale = jnp.maximum(amax, 1e-30) / 127.0
        scaled = v / scale
        if stochastic and not interpret:
            # unbiased integer stochastic rounding: floor(x + U[0,1)).
            # (pltpu.stochastic_round only targets float dtypes.)
            bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape),
                                 jnp.int32)  # Mosaic can't cast uint32->f32
            u24 = jnp.bitwise_and(jnp.right_shift(bits, 8), 0xFFFFFF)
            u = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
            q = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(jnp.int8)
        else:
            q = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
        q_ref[:] = q
        if per_row:
            scale_ref[:] = jnp.broadcast_to(scale, scale_ref.shape)
        else:
            scale_ref[0, 0] = scale

    return pl.pallas_call(
        kernel,
        grid=(cdiv(rows, br),),
        in_specs=[
            pl.BlockSpec((br, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            if per_row else
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((br, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1) if per_row
                                 else (cdiv(rows, br), 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.int8),
        ],
        interpret=interpret,
    )


def quantize_int8(x: jax.Array, *, per_row: bool = True,
                  stochastic: bool = False, seed: int = 0,
                  interpret: Optional[bool] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Quantize a 2D array to int8. Returns (q, scales).

    per_row=True: one scale per row (the GEMM-friendly layout for the A
    operand); False: one global scale (max over per-block partials).
    stochastic=True uses the TPU hardware stochastic rounding (unbiased;
    falls back to round-to-nearest in interpret mode).
    """
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("quantize_int8 expects a 2D array")
    rows, cols = x.shape
    interp = should_interpret() if interpret is None else interpret
    if cols % LANES or rows % 8:
        # pad to hardware tiles; scales computed on real data only (pads are 0)
        rp, cp = round_step_up(rows, 8), round_step_up(cols, LANES)
        q, s = quantize_int8(jnp.pad(x, ((0, rp - rows), (0, cp - cols))),
                             per_row=per_row, stochastic=stochastic,
                             seed=seed, interpret=interp)
        return q[:rows, :cols], (s[:rows] if per_row else s)
    br = max(8, min(rows, (2 * 1024 * 1024 // 4) // cols))
    br = max(8, (br // 8) * 8)
    if not per_row and cdiv(rows, br) > 1:
        # global scale needs the true max first: cheap XLA pass, then one
        # kernel with the fixed scale via the per-row path on a scaled input.
        amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
        scale = (amax / 127.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127,
                     127).astype(jnp.int8)
        return q, scale.reshape(1, 1)
    call = _build_quantize(rows, cols, br, per_row, stochastic,
                           jnp.dtype(x.dtype).name, interp)
    scales, q = call(x, jnp.asarray([seed], jnp.int32))
    return q, scales


def dequantize_int8(q: jax.Array, scales: jax.Array) -> jax.Array:
    """int8 + scales -> f32 (scales broadcast: (rows,1), (1,1) or scalar)."""
    return q.astype(jnp.float32) * jnp.asarray(scales, jnp.float32)


def gemm_quantized(a: jax.Array, b: jax.Array, *,
                   stochastic: bool = False, seed: int = 0,
                   interpret: Optional[bool] = None) -> jax.Array:
    """f32-in/f32-out GEMM through the int8 MXU path.

    a (M,K) gets per-row scales, b (K,N) a per-column scale (via its
    transpose's rows); result = (qa @ qb) * sa * sb — ~2x the bf16 MXU rate
    at ~7-bit mantissa accuracy.
    """
    from .gemm import gemm

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    qa, sa = quantize_int8(a, per_row=True, stochastic=stochastic, seed=seed,
                           interpret=interpret)
    qbt, sb = quantize_int8(b.T, per_row=True, stochastic=stochastic,
                            seed=seed + 1, interpret=interpret)
    acc = gemm(qa, qbt, transpose_b=True, interpret=interpret)  # int32
    return acc.astype(jnp.float32) * sa * sb.reshape(1, -1)