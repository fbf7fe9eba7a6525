"""Differentiable wrappers over the Pallas GEMM.

The reference is a forward-only primitives library; a TPU-native framework
must also be trainable, so the flagship kernel gets a custom VJP (the
pattern production Pallas kernels use — see pallas_guide 'Patterns: Custom
VJP'). Backward of C = A @ B is two more GEMMs on the same kernel:
dA = G @ B^T, dB = A^T @ G — so training rides the exact same MXU path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .api import gemm


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gemm_ad(a: jax.Array, b: jax.Array, out_dtype: Optional[str] = None,
            transpose_a: bool = False, transpose_b: bool = False):
    """Differentiable C = op(A) @ op(B) through the Pallas MXU kernel."""
    return gemm(a, b, out_dtype=out_dtype, transpose_a=transpose_a,
                transpose_b=transpose_b)


def _fwd(a, b, out_dtype, transpose_a, transpose_b):
    return gemm(a, b, out_dtype=out_dtype, transpose_a=transpose_a,
                transpose_b=transpose_b), (a, b)


def _bwd(out_dtype, transpose_a, transpose_b, res, g):
    a, b = res
    adt = jnp.dtype(a.dtype).name
    bdt = jnp.dtype(b.dtype).name
    # All four orientations, every backward contraction in place on the MXU.
    if not transpose_a:
        da = gemm(g, b, transpose_b=not transpose_b, out_dtype=adt)
    else:  # C = A^T B: dA = B G^T (stored (K,M): dA^T... dA = B @ G^T)
        da = gemm(b, g, transpose_a=transpose_b, transpose_b=True,
                  out_dtype=adt)
    if not transpose_b:
        db = gemm(a, g, transpose_a=not transpose_a, out_dtype=bdt)
    else:  # C = A B^T: dB = G^T A
        db = gemm(g, a, transpose_a=True, transpose_b=transpose_a,
                  out_dtype=bdt)
    return da, db


gemm_ad.defvjp(_fwd, _bwd)


def linear(x: jax.Array, w: jax.Array, bias: Optional[jax.Array] = None,
           activation: Optional[str] = None) -> jax.Array:
    """Differentiable fused linear layer.

    Forward runs ONE Pallas kernel with the bias+activation epilogue fused
    (the reference's roadmap feature, README.md:238-245); backward decomposes
    into the activation VJP (cheap, fused by XLA) + two Pallas GEMMs.
    """
    if bias is None:
        # keep the custom_vjp arg structure uniform (None isn't a leaf)
        bias = jnp.zeros((w.shape[1],), w.dtype)
    return _linear_ad(x, w, bias, activation)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _linear_ad(x, w, bias, activation):
    return gemm(x, w, bias=bias, epilogue=activation)


_ACT = {None: (lambda z: z, lambda z: jnp.ones_like(z)),
        "none": (lambda z: z, lambda z: jnp.ones_like(z)),
        "relu": (lambda z: jnp.maximum(z, 0),
                 lambda z: (z > 0).astype(z.dtype)),
        "tanh": (jnp.tanh, lambda z: 1 - jnp.tanh(z) ** 2),
        "sigmoid": (jax.nn.sigmoid,
                    lambda z: jax.nn.sigmoid(z) * (1 - jax.nn.sigmoid(z))),
        "gelu": (jax.nn.gelu, None)}  # gelu' via jax.vjp fallback


def _linear_fwd(x, w, bias, activation):
    z = gemm(x, w, bias=bias)  # pre-activation saved as the residual
    act, _ = _ACT[activation]
    return act(z), (x, w, z)


def _linear_bwd(activation, res, g):
    x, w, z = res
    act, dact = _ACT[activation]
    if dact is None:
        _, vjp = jax.vjp(act, z)
        gz = vjp(g)[0]
    else:
        gz = g * dact(z)
    dx = gemm(gz, w, transpose_b=True)
    dw = gemm(x, gz, transpose_a=True)
    db = jnp.sum(gz, axis=0)
    return dx, dw, db


_linear_ad.defvjp(_linear_fwd, _linear_bwd)
