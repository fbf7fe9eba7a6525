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

Causality is evaluated in GLOBAL coordinates inside the flash kernel
(q_offset/k_offset SMEM scalars): one kernel invocation per ring step covers
past chunks (fully visible), the diagonal chunk (triangular), and future
chunks (every block skipped, near-zero cost) — ~1x flash FLOPs total, where
the round-1 version ran both a full and a causal pass and selected.

``ring_attention`` carries a custom VJP: the backward rotates (K, V, dK, dV)
around the ring while Q/dO and the GLOBAL softmax stats (m, l) stay local,
reusing the fused flash backward kernels (ops/attention_bwd.py) per chunk —
sequence-parallel *training*, O(S/n) memory per device.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import should_interpret
from ..ops.attention import _NEG_INF, attention_with_stats
from ..utils import round_step_up


def _merge(o1, m1, l1, o2, m2, l2):
    """Combine two partial attentions over disjoint key sets."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    l = a1 + a2
    denom = jnp.where(l > 0, l, 1.0)
    o = (o1 * a1[..., None] + o2 * a2[..., None]) / denom[..., None]
    return o.astype(o1.dtype), m, l


def _ring_fwd_body(q_loc, k_loc, v_loc, *, axis, n, causal, scale_v,
                   block_q, block_k):
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
            # ONE kernel call: global-coordinate causal mask; future chunks
            # have all their blocks skipped inside the kernel
            o_t, m_t, l_t = attention_with_stats(
                q_loc, k_cur, v_cur, causal=True, scale=scale_v,
                q_offset=me * s_loc, k_offset=src * s_loc,
                block_q=block_q, block_k=block_k)
        else:
            o_t, m_t, l_t = attention_with_stats(
                q_loc, k_cur, v_cur, causal=False, scale=scale_v,
                block_q=block_q, block_k=block_k)
        o, m, l = _merge(o, m, l, o_t, m_t.astype(jnp.float32),
                         l_t.astype(jnp.float32))
        if step != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
    return o, m, l


def _pad3(t, SP, DP):
    B, s, D = t.shape
    if SP != s or DP != D:
        t = jnp.pad(t, ((0, 0), (0, SP - s), (0, DP - D)))
    return t


def _ring_bwd_body(q_loc, k_loc, v_loc, o_loc, m_loc, l_loc, g_loc, *,
                   axis, n, causal, scale_v, block_q, block_k):
    from ..ops.attention_bwd import flash_attention_bwd

    me = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    B, s_loc, D = q_loc.shape
    bq = min(block_q, round_step_up(s_loc, 8))
    bk = min(block_k, round_step_up(s_loc, 128))
    SP = round_step_up(s_loc, max(bq, bk))
    DP = round_step_up(D, 128)
    interp = should_interpret()

    q3 = _pad3(q_loc, SP, DP)
    g3 = _pad3(g_loc, SP, DP)
    o3 = _pad3(o_loc, SP, DP)
    # global softmax stats, lane-replicated the way the kernels expect
    m3 = jnp.broadcast_to(m_loc[..., None], (B, s_loc, 128))
    l3 = jnp.broadcast_to(l_loc[..., None], (B, s_loc, 128))
    if SP != s_loc:
        m3 = jnp.pad(m3, ((0, 0), (0, SP - s_loc), (0, 0)),
                     constant_values=_NEG_INF)
        l3 = jnp.pad(l3, ((0, 0), (0, SP - s_loc), (0, 0)))
    dvec = jnp.sum(g3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1)

    dq = jnp.zeros((B, SP, DP), q_loc.dtype)
    k_cur, v_cur = k_loc, v_loc
    dk_cur = jnp.zeros((B, SP, DP), k_loc.dtype)
    dv_cur = jnp.zeros((B, SP, DP), v_loc.dtype)

    for step in range(n):
        src = (me - step) % n
        k3 = _pad3(k_cur, SP, DP)
        v3 = _pad3(v_cur, SP, DP)
        dq_c, dk_c, dv_c = flash_attention_bwd(
            q3, k3, v3, o3, m3, l3, g3, S=s_loc, SP=SP, D=DP, bq=bq, bk=bk,
            causal=causal, scale=scale_v, interpret=interp,
            q_off=me * s_loc if causal else 0,
            k_off=src * s_loc if causal else 0, dvec=dvec)
        dq = dq + dq_c
        dk_cur = dk_cur + dk_c
        dv_cur = dv_cur + dv_c
        if step != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            dk_cur = jax.lax.ppermute(dk_cur, axis, perm)
            dv_cur = jax.lax.ppermute(dv_cur, axis, perm)
    # after n-1 rotations device d holds grads for chunk (d+1) % n;
    # one more rotation brings every chunk's gradient home
    dk_cur = jax.lax.ppermute(dk_cur, axis, perm)
    dv_cur = jax.lax.ppermute(dv_cur, axis, perm)
    return (dq[:, :s_loc, :D], dk_cur[:, :s_loc, :D], dv_cur[:, :s_loc, :D])


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ring_ad(q, k, v, mesh, axis, causal, scale_v, block_q, block_k):
    o, _, _ = _ring_shard_fwd(q, k, v, mesh, axis, causal, scale_v,
                              block_q, block_k)
    return o


def _ring_shard_fwd(q, k, v, mesh, axis, causal, scale_v, block_q, block_k):
    n = mesh.shape[axis]
    body = partial(_ring_fwd_body, axis=axis, n=n, causal=causal,
                   scale_v=scale_v, block_q=block_q, block_k=block_k)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None),) * 3,
        out_specs=(P(None, axis, None), P(None, axis), P(None, axis)),
        check_vma=False)
    return mapped(q, k, v)


def _ring_ad_fwd(q, k, v, mesh, axis, causal, scale_v, block_q, block_k):
    o, m, l = _ring_shard_fwd(q, k, v, mesh, axis, causal, scale_v,
                              block_q, block_k)
    return o, (q, k, v, o, m, l)


def _ring_ad_bwd(mesh, axis, causal, scale_v, block_q, block_k, res, g):
    q, k, v, o, m, l = res
    n = mesh.shape[axis]
    body = partial(_ring_bwd_body, axis=axis, n=n, causal=causal,
                   scale_v=scale_v, block_q=block_q, block_k=block_k)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None),) * 4 + (P(None, axis),) * 2
        + (P(None, axis, None),),
        out_specs=(P(None, axis, None),) * 3,
        check_vma=False)
    return mapped(q, k, v, o, m, l, g)


_ring_ad.defvjp(_ring_ad_fwd, _ring_ad_bwd)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh, *,
                   axis: str = "sp", causal: bool = False,
                   scale: Optional[float] = None,
                   block_q: int = 1024, block_k: int = 1024) -> jax.Array:
    """Sequence-parallel attention over global (B, S, D) tensors.

    S must be divisible by the ``axis`` size; inputs/outputs are global
    arrays (shard_map handles the S-dim partitioning). Differentiable:
    ``jax.grad`` through this runs the ring flash backward.
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
    return _ring_ad(q, k, v, mesh, axis, causal, float(scale_v),
                    block_q, block_k)
