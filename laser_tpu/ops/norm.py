"""Fused row normalization kernels: layer_norm and rms_norm.

Standard members of a TPU kernel zoo, built exactly like the fused softmax
(ops/vector_math.py): one kernel per row tile doing the statistics
reduction + normalize + affine in VMEM, one HBM read + one write. These are
the normalization analogs of the reference's declared vector-math roadmap
(README.md:170-181) and reuse the staged-reduction design of C20/C21.
"""

from __future__ import annotations

from typing import Optional

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
def _build_norm(rows: int, rp: int, cols: int, cp: int, br: int, kind: str,
                eps: float, has_affine: bool, dtype: str, interpret: bool):
    dt = jnp.dtype(dtype)
    inv_n = 1.0 / cols  # statistics over the LOGICAL row length

    def kernel(*refs):
        x_ref = refs[0]
        o_ref = refs[-1]
        g_ref = refs[1] if has_affine else None
        b_ref = refs[2] if has_affine else None
        v = x_ref[:].astype(jnp.float32)
        # padded tail columns are zero; statistics divide by the logical cols
        if kind == "layer":
            mean = jnp.sum(v, axis=-1, keepdims=True) * inv_n
            centered = v - mean
            if cp != cols:
                col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                centered = jnp.where(col < cols, centered, 0.0)
            var = jnp.sum(centered * centered, axis=-1, keepdims=True) * inv_n
            y = centered * jax.lax.rsqrt(var + eps)
        else:  # rms
            ms = jnp.sum(v * v, axis=-1, keepdims=True) * inv_n
            y = v * jax.lax.rsqrt(ms + eps)
        if has_affine:
            y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(dt)

    in_specs = [pl.BlockSpec((br, cp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_affine:
        in_specs += [pl.BlockSpec((1, cp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    return pl.pallas_call(
        kernel,
        grid=(cdiv(rp, br),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cp), dt),
        input_output_aliases={0: 0} if (rp, cp) != (rows, cols) else {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _norm(x, gamma, beta, kind: str, axis: int, eps: float,
          interpret: Optional[bool]):
    x = jnp.asarray(x)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    orig_shape = x.shape
    cols = orig_shape[-1]
    rows = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    x2 = x.reshape(rows, cols)
    has_affine = gamma is not None
    if has_affine:
        gamma = jnp.asarray(gamma).reshape(1, cols)
        beta = (jnp.asarray(beta).reshape(1, cols) if beta is not None
                else jnp.zeros((1, cols), x.dtype))

    cp = round_step_up(cols, LANES)
    rp = round_step_up(rows, 8)
    if (rp, cp) != (rows, cols):
        x2 = jnp.pad(x2, ((0, rp - rows), (0, cp - cols)))
        if has_affine:
            gamma = jnp.pad(gamma, ((0, 0), (0, cp - cols)))
            beta = jnp.pad(beta, ((0, 0), (0, cp - cols)))
    br = max(8, min(rp, (2 * 1024 * 1024 // 4) // cp))
    br = max(8, (br // 8) * 8)
    interp = should_interpret() if interpret is None else interpret

    call = _build_norm(rows, rp, cols, cp, br, kind, float(eps), has_affine,
                       jnp.dtype(x.dtype).name, interp)
    args = (x2, gamma, beta) if has_affine else (x2,)
    out = call(*args)
    if (rp, cp) != (rows, cols):
        out = out[:rows, :cols]
    out = out.reshape(orig_shape)
    if axis != -1 and axis != len(orig_shape) - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def _layer_norm_reference(x, gamma, beta, axis, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=axis, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y.astype(x.dtype)


def _rms_norm_reference(x, gamma, axis, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=axis, keepdims=True) + eps)
    if gamma is not None:
        y = y * gamma
    return y.astype(x.dtype)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layer_norm_ad(x, gamma, beta, axis, eps):
    return _norm(x, gamma, beta, "layer", axis, eps, None)


def _ln_fwd(x, gamma, beta, axis, eps):
    return _norm(x, gamma, beta, "layer", axis, eps, None), (x, gamma, beta)


def _ln_bwd(axis, eps, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, gm, bt: _layer_norm_reference(x, gm, bt, axis, eps),
        x, gamma, beta)
    return vjp(g)


_layer_norm_ad.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rms_norm_ad(x, gamma, axis, eps):
    return _norm(x, gamma, None, "rms", axis, eps, None)


def _rms_fwd(x, gamma, axis, eps):
    return _norm(x, gamma, None, "rms", axis, eps, None), (x, gamma)


def _rms_bwd(axis, eps, res, g):
    x, gamma = res
    _, vjp = jax.vjp(lambda x, gm: _rms_norm_reference(x, gm, axis, eps),
                     x, gamma)
    return vjp(g)


_rms_norm_ad.defvjp(_rms_fwd, _rms_bwd)


def layer_norm(x, gamma=None, beta=None, *, axis: int = -1, eps: float = 1e-6,
               interpret: Optional[bool] = None) -> jax.Array:
    """Fused LayerNorm over ``axis`` (mean/var statistics + scale/shift in
    one kernel pass). Differentiable: the fused kernel runs forward; the
    backward recomputes through the XLA reference (exact)."""
    if gamma is None:
        d = jnp.asarray(x).shape[axis]
        gamma = jnp.ones((d,), jnp.asarray(x).dtype)
    if beta is None:
        beta = jnp.zeros_like(gamma)
    return _layer_norm_ad(x, gamma, beta, axis, eps)


def rms_norm(x, gamma=None, *, axis: int = -1, eps: float = 1e-6,
             interpret: Optional[bool] = None) -> jax.Array:
    """Fused RMSNorm over ``axis`` (differentiable like layer_norm)."""
    if gamma is None:
        d = jnp.asarray(x).shape[axis]
        gamma = jnp.ones((d,), jnp.asarray(x).dtype)
    return _rms_norm_ad(x, gamma, axis, eps)