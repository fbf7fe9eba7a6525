"""Rotary position embeddings (RoPE).

The position-encoding standard of modern decoder LLMs: rotate each
(x[..., i], x[..., i + D/2]) pair by an angle proportional to the token
position, with per-pair frequencies theta_i = base^(-2i/D) (the "rotate
half" convention). Pure VPU elementwise work — XLA fuses it into the
surrounding projections, so no dedicated kernel is needed; the tables are
precomputed once per (S, D) and reused across layers and steps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_tables(max_len: int, head_dim: int, *, base: float = 10000.0
                ) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin) tables of shape (max_len, head_dim/2), float32."""
    if head_dim % 2:
        raise ValueError(f"head_dim must be even, got {head_dim}")
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    ang = np.arange(max_len)[:, None] * inv[None, :]
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, *,
               position_offset=0) -> jax.Array:
    """Rotate x (..., S, D) by the tables at positions
    [offset, offset + S). ``position_offset`` may be traced (decode)."""
    S, D = x.shape[-2], x.shape[-1]
    c = jax.lax.dynamic_slice_in_dim(cos, position_offset, S, 0)
    s = jax.lax.dynamic_slice_in_dim(sin, position_offset, S, 0)
    shape = (1,) * (x.ndim - 2) + (S, D // 2)
    c = c.reshape(shape).astype(x.dtype)
    s = s.reshape(shape).astype(x.dtype)
    x1 = x[..., : D // 2]
    x2 = x[..., D // 2:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def apply_rope_at(x: jax.Array, cos: jax.Array, sin: jax.Array,
                  positions: jax.Array) -> jax.Array:
    """Rotate x (B, H, D) by per-row positions (B,) int32 — the batched
    decode case where every sequence in the batch sits at its own position
    (continuous batching, serving/engine.py)."""
    D = x.shape[-1]
    c = cos[positions][:, None, :].astype(x.dtype)  # (B, 1, D/2)
    s = sin[positions][:, None, :].astype(x.dtype)
    x1 = x[..., : D // 2]
    x2 = x[..., D // 2:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
