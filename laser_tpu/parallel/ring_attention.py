"""Ring attention: sequence-parallel fused attention over a mesh axis.

SURVEY §5 lists long-context sequence parallelism as absent in the reference
and names blockwise attention as the TPU generalization of its cache-blocked
K streaming. This is the multi-chip step: K/V live sequence-sharded across
the ``sp`` axis, and each step every device attends its local Q chunk against
the K/V chunk it currently holds, then rotates the chunk around the ring
(``jax.lax.ppermute`` over ICI). Partial attentions over disjoint key sets
merge exactly with the log-sum-exp combination of the flash residuals
(ops/attention.py:attention_with_stats) — the same online-softmax algebra,
lifted from VMEM blocks to chips.

Causality is enforced at chunk granularity: a key chunk strictly before the
query chunk attends fully, the diagonal chunk attends causally, and future
chunks are skipped (zero contribution).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import _NEG_INF, attention_with_stats


def _merge(o1, m1, l1, o2, m2, l2):
    """Combine two partial attentions over disjoint key sets."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    l = a1 + a2
    denom = jnp.where(l > 0, l, 1.0)
    o = (o1 * a1[..., None] + o2 * a2[..., None]) / denom[..., None]
    return o.astype(o1.dtype), m, l


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh, *,
                   axis: str = "sp", causal: bool = False,
                   scale: Optional[float] = None,
                   block_q: int = 1024, block_k: int = 1024) -> jax.Array:
    """Sequence-parallel attention over global (B, S, D) tensors.

    S must be divisible by the ``axis`` size; inputs/outputs are global
    arrays (shard_map handles the S-dim partitioning).
    """
    q, k, v = map(jnp.asarray, (q, k, v))
    if q.ndim != 3:
        raise ValueError("ring_attention expects (B, S, D); flatten heads "
                         "into B")
    B, S, D = q.shape
    n = mesh.shape[axis]
    if S % n:
        raise ValueError(f"S={S} not divisible by {axis} size {n}")
    scale_v = scale if scale is not None else 1.0 / math.sqrt(D)

    def body(q_loc, k_loc, v_loc):
        me = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n) for i in range(n)]
        s_loc = q_loc.shape[1]

        o = jnp.zeros_like(q_loc)
        m = jnp.full(q_loc.shape[:-1], _NEG_INF, jnp.float32)
        l = jnp.zeros(q_loc.shape[:-1], jnp.float32)
        k_cur, v_cur = k_loc, v_loc

        for step in range(n):  # static ring schedule
            src = (me - step) % n  # global chunk index currently held
            if causal:
                o_f, m_f, l_f = attention_with_stats(
                    q_loc, k_cur, v_cur, causal=False, scale=scale_v,
                    block_q=block_q, block_k=block_k)
                o_c, m_c, l_c = attention_with_stats(
                    q_loc, k_cur, v_cur, causal=True, scale=scale_v,
                    block_q=block_q, block_k=block_k)
                is_diag = src == me
                is_past = src < me
                o_t = jnp.where(is_diag, o_c, o_f)
                m_t = jnp.where(is_diag, m_c, m_f)
                l_t = jnp.where(is_diag, l_c, l_f)
                # future chunks contribute nothing
                m_t = jnp.where(is_past | is_diag, m_t, _NEG_INF)
                l_t = jnp.where(is_past | is_diag, l_t, 0.0)
                o_t = jnp.where(is_past | is_diag, o_t, 0.0)
            else:
                o_t, m_t, l_t = attention_with_stats(
                    q_loc, k_cur, v_cur, causal=False, scale=scale_v,
                    block_q=block_q, block_k=block_k)
            o, m, l = _merge(o, m, l, o_t, m_t.astype(jnp.float32),
                             l_t.astype(jnp.float32))
            if step != n - 1:
                k_cur = jax.lax.ppermute(k_cur, axis, perm)
                v_cur = jax.lax.ppermute(v_cur, axis, perm)
        return o

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None),) * 3,
        out_specs=P(None, axis, None),
        check_vma=False)
    return mapped(q, k, v)