"""Small CNN classifier built on the laser-tpu conv/pool/linear kernels.

Second model family next to models/mlp.py: exercises conv2d (planewise or
im2col paths by shape), the layout kernels, and the fused linear head —
i.e. the conv benchmark components (SURVEY §2.2 benchmarks/convolution) as a
usable model.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d_direct
from ..ops.gemm.autodiff import linear
from ..ops.vector_math import softmax

Params = Dict[str, jax.Array]


def init_cnn(key: jax.Array, *, in_channels: int = 3,
             conv_channels: Sequence[int] = (16, 32),
             hidden: int = 128, num_classes: int = 10,
             image_hw: int = 32, dtype=jnp.float32) -> List[Params]:
    """Conv(3x3,s1,p1) + ReLU + 2x2 mean-pool blocks, then MLP head."""
    params: List[Params] = []
    c_prev = in_channels
    hw = image_hw
    for c in conv_channels:
        key, k = jax.random.split(key)
        params.append({
            "w": jax.random.normal(k, (c, c_prev, 3, 3), dtype)
            * jnp.sqrt(2.0 / (c_prev * 9)).astype(dtype),
            "b": jnp.zeros((c,), dtype),
        })
        c_prev = c
        hw //= 2
    key, k1, k2 = jax.random.split(key, 3)
    flat = c_prev * hw * hw
    params.append({"w": jax.random.normal(k1, (flat, hidden), dtype)
                   * jnp.sqrt(2.0 / flat).astype(dtype),
                   "b": jnp.zeros((hidden,), dtype)})
    params.append({"w": jax.random.normal(k2, (hidden, num_classes), dtype)
                   * jnp.sqrt(2.0 / hidden).astype(dtype),
                   "b": jnp.zeros((num_classes,), dtype)})
    return params


def mean_pool2x2(x: jax.Array) -> jax.Array:
    """(N,C,H,W) -> (N,C,H/2,W/2) 2x2 mean pooling."""
    N, C, H, W = x.shape
    return x.reshape(N, C, H // 2, 2, W // 2, 2).mean(axis=(3, 5))


def cnn_forward(params: List[Params], x: jax.Array) -> jax.Array:
    """Logits for NCHW images."""
    h = x
    n_conv = len(params) - 2
    for layer in params[:n_conv]:
        h = conv2d_direct(h, layer["w"], padding=(1, 1))
        h = jnp.maximum(h + layer["b"][None, :, None, None], 0)
        h = mean_pool2x2(h)
    h = h.reshape(h.shape[0], -1)
    h = linear(h, params[-2]["w"], params[-2]["b"], "relu")
    return linear(h, params[-1]["w"], params[-1]["b"], None)


def cnn_predict(params: List[Params], x: jax.Array) -> jax.Array:
    return softmax(cnn_forward(params, x))
