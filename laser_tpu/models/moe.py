"""Mixture-of-experts transformer — the fourth model family.

The reference is a CPU kernel library with no model zoo; this family is
parity-plus composition proof at production shape: flash-attention blocks
(ops/attention.py) whose FFN is a top-k softmax-gated expert mixture
(parallel/moe.py routing), with the Switch/GShard load-balancing auxiliary
loss, a single-device training step, and an expert-parallel training step
over a Mesh (experts sharded on ``ep``; the MoE FFN rides
``parallel.moe.moe_layer``'s shard_map + psum while everything else stays
replicated).

Every matmul is a fused laser kernel: `linear` (custom-VJP Pallas GEMM) for
QKV/output/experts, `attention_trainable` (flash fwd + fused flash bwd),
`layer_norm` row kernels — the same composition contract as
models/transformer.py, plus routing.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention_trainable as attention
from ..ops.gemm.autodiff import gemm_ad, linear
from ..ops.loss import lm_cross_entropy
from ..ops.norm import layer_norm
from ..parallel.moe import _topk_gates, init_moe

Params = Dict[str, jax.Array]


def init_moe_transformer(key: jax.Array, *, n_layers: int, d_model: int,
                         n_heads: int, d_ff: int, vocab: int,
                         n_experts: int, dtype=jnp.float32) -> Dict:
    """Transformer LM whose per-block FFN is an ``n_experts`` mixture."""
    if d_model % n_heads:
        raise ValueError(
            f"d_model {d_model} not divisible by n_heads {n_heads}")
    keys = jax.random.split(key, n_layers + 2)
    blocks = []
    for i in range(n_layers):
        ks = jax.random.split(keys[i + 1], 4)
        s = jnp.sqrt(1.0 / d_model).astype(dtype)
        blocks.append({
            "wqkv": jax.random.normal(ks[0], (d_model, 3 * d_model),
                                      dtype) * s,
            "bqkv": jnp.zeros((3 * d_model,), dtype),
            "wo": jax.random.normal(ks[1], (d_model, d_model), dtype) * s,
            "bo": jnp.zeros((d_model,), dtype),
            "ln1_g": jnp.ones((d_model,), dtype),
            "ln1_b": jnp.zeros((d_model,), dtype),
            "ln2_g": jnp.ones((d_model,), dtype),
            "ln2_b": jnp.zeros((d_model,), dtype),
            "moe": init_moe(ks[2], n_experts=n_experts, d_model=d_model,
                            d_ff=d_ff, dtype=dtype),
        })
    return {
        "embed": jax.random.normal(keys[0], (vocab, d_model), dtype) * 0.02,
        "blocks": blocks,
        "lnf_g": jnp.ones((d_model,), dtype),
        "lnf_b": jnp.zeros((d_model,), dtype),
    }


def load_balance_loss(gate_logits: jax.Array, gates: jax.Array) -> jax.Array:
    """Switch-transformer auxiliary loss: E * sum_e f_e * p_e.

    f_e = fraction of tokens whose top-1 expert is e (hard assignment),
    p_e = mean router probability for e (soft). Minimized (= 1.0) at a
    perfectly uniform router; differentiable through p_e."""
    E = gate_logits.shape[-1]
    top1 = jnp.argmax(gate_logits, axis=-1)
    f = jnp.mean(jax.nn.one_hot(top1, E, dtype=gate_logits.dtype), axis=0)
    p = jnp.mean(jax.nn.softmax(gate_logits, axis=-1), axis=0)
    return E * jnp.sum(f * p)


def _moe_ffn(moe: Params, x2d: jax.Array, *, top_k: int
             ) -> Tuple[jax.Array, jax.Array]:
    """Dense-dispatch expert mixture on the fused linear kernels.

    x2d (T, D) -> (out (T, D), aux loss). Every expert runs every token,
    masked by its (top-k-normalized) gate — exact and differentiable; the
    sparse all_to_all dispatch lives in parallel.moe.moe_layer_sparse."""
    logits = x2d @ moe["router"]
    gates = _topk_gates(logits, top_k)
    E = moe["router"].shape[1]
    out = jnp.zeros_like(x2d)
    for e in range(E):
        h = linear(x2d, moe["w1"][e], None, "relu")
        h = linear(h, moe["w2"][e], None, None)
        out = out + gates[:, e:e + 1] * h
    return out, load_balance_loss(logits, gates)


def moe_block(params: Params, x: jax.Array, *, n_heads: int, top_k: int,
              causal: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Pre-norm block: x + MHA(LN(x)); x + MoE(LN(x)). x (B, S, D)."""
    B, S, D = x.shape
    hd = D // n_heads

    h = layer_norm(x, params["ln1_g"], params["ln1_b"])
    qkv = linear(h.reshape(B * S, D), params["wqkv"], params["bqkv"])
    q, k, v = jnp.split(qkv.reshape(B, S, 3 * D), 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, n_heads, hd).transpose(0, 2, 1, 3)

    o = attention(heads(q), heads(k), heads(v), causal=causal)
    o = o.transpose(0, 2, 1, 3).reshape(B * S, D)
    x = x + linear(o, params["wo"], params["bo"]).reshape(B, S, D)

    h = layer_norm(x, params["ln2_g"], params["ln2_b"])
    f, aux = _moe_ffn(params["moe"], h.reshape(B * S, D), top_k=top_k)
    return x + f.reshape(B, S, D), aux


def moe_transformer_hidden(params: Dict, tokens: jax.Array, *,
                           n_heads: int, top_k: int = 2,
                           causal: bool = True
                           ) -> Tuple[jax.Array, jax.Array]:
    """tokens (B, S) int32 -> (final-norm hidden (B, S, D), mean aux)."""
    x = params["embed"][tokens]
    aux = jnp.float32(0)
    for blk in params["blocks"]:
        x, a = moe_block(blk, x, n_heads=n_heads, top_k=top_k,
                         causal=causal)
        aux = aux + a
    x = layer_norm(x, params["lnf_g"], params["lnf_b"])
    return x, aux / len(params["blocks"])


def moe_transformer_forward(params: Dict, tokens: jax.Array, *,
                            n_heads: int, top_k: int = 2,
                            causal: bool = True
                            ) -> Tuple[jax.Array, jax.Array]:
    """tokens (B, S) int32 -> (logits (B, S, vocab), mean aux loss)."""
    x, aux = moe_transformer_hidden(params, tokens, n_heads=n_heads,
                                    top_k=top_k, causal=causal)
    B, S, D = x.shape
    logits = gemm_ad(x.reshape(B * S, D), params["embed"], None, False, True)
    return logits.reshape(B, S, -1), aux


def moe_lm_loss(params: Dict, tokens: jax.Array, *, n_heads: int,
                top_k: int = 2, aux_weight: float = 0.01) -> jax.Array:
    """Next-token cross entropy + weighted load-balance auxiliary loss.

    The unembedding and the loss run as ONE chunked-vocab pass
    (ops/loss.py:lm_cross_entropy): the (B·S, vocab) logits are never
    materialized in the training step, forward or backward.
    """
    x, aux = moe_transformer_hidden(params, tokens, n_heads=n_heads,
                                    top_k=top_k)
    ce = lm_cross_entropy(x[:, :-1], params["embed"], tokens[:, 1:])
    return ce + aux_weight * aux


def moe_train_step(params: Dict, tokens: jax.Array, *, n_heads: int,
                   top_k: int = 2, lr: float = 1e-2,
                   aux_weight: float = 0.01,
                   clip_norm=None) -> Tuple[Dict, jax.Array]:
    """One SGD step; returns (new params, loss). Jittable. clip_norm:
    global-L2 gradient clipping (the same knob as the llama/transformer
    train steps)."""
    from ..ops.optim import clip_by_global_norm

    loss, grads = jax.value_and_grad(moe_lm_loss)(
        params, tokens, n_heads=n_heads, top_k=top_k,
        aux_weight=aux_weight)
    if clip_norm is not None:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    new = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new, loss


# ---------------------------------------------------------------------------
# Expert-parallel training step: experts sharded over "ep".
# ---------------------------------------------------------------------------

def _ep_moe_ffn(axis: str, e_loc: int):
    """Expert-sharded mixture FFN with a HAND-DERIVED backward.

    Differentiating a psum through shard_map(check_vma=False) silently
    drops the cross-device sum that a replicated input's cotangent needs
    (each device would see only its local experts' dh2). Same policy as
    models/mlp.py's megatron step: no collective is ever differentiated —
    this custom_vjp psums the forward combine AND the dh2/dgates
    cotangents explicitly, so autodiff above it (attention, router,
    layer norms, CE — all replicated computations) stays collective-free
    and correct. Expert-weight grads are local to their shard by
    construction. Backward rematerializes z1/r instead of saving them
    (jax.checkpoint policy: FLOPs are cheaper than VMEM-resident
    residuals on TPU)."""

    @jax.custom_vjp
    def f(h2, gates, w1, w2):
        return _fwd(h2, gates, w1, w2)[0]

    def _fwd(h2, gates, w1, w2):
        me = jax.lax.axis_index(axis)
        local = jnp.zeros_like(h2)
        for j in range(e_loc):
            r = linear(h2, w1[j], None, "relu")
            o_j = linear(r, w2[j], None, None)
            g = jax.lax.dynamic_index_in_dim(gates, me * e_loc + j, 1,
                                             keepdims=True)
            local = local + g * o_j
        return jax.lax.psum(local, axis), (h2, gates, w1, w2)

    def _bwd(res, dout):
        h2, gates, w1, w2 = res
        me = jax.lax.axis_index(axis)
        E = gates.shape[1]
        dh2 = jnp.zeros_like(h2)
        dgate_cols = []
        dw1 = jnp.zeros_like(w1)
        dw2 = jnp.zeros_like(w2)
        for j in range(e_loc):
            z1 = linear(h2, w1[j], None, None)
            r = jnp.maximum(z1, 0)
            o_j = linear(r, w2[j], None, None)
            g = jax.lax.dynamic_index_in_dim(gates, me * e_loc + j, 1,
                                             keepdims=True)
            d_oj = dout * g
            dgate_cols.append(jnp.sum(dout * o_j, axis=-1))  # (T,)
            dr = gemm_ad(d_oj, w2[j], None, False, True)     # d_oj @ w2^T
            dw2 = dw2.at[j].set(gemm_ad(r, d_oj, None, True, False))
            dz1 = dr * (z1 > 0).astype(dr.dtype)
            dw1 = dw1.at[j].set(gemm_ad(h2, dz1, None, True, False))
            dh2 = dh2 + gemm_ad(dz1, w1[j], None, False, True)
        # scatter local gate grads into full-E columns, then sum shards
        dg_local = jnp.stack(dgate_cols, axis=1)             # (T, e_loc)
        base = me * e_loc
        col = jax.lax.broadcasted_iota(jnp.int32, (h2.shape[0], E), 1)
        in_shard = (col >= base) & (col < base + e_loc)
        dgates = jnp.where(
            in_shard,
            jax.lax.dynamic_update_slice(jnp.zeros((h2.shape[0], E),
                                                   dg_local.dtype),
                                         dg_local, (0, base)),
            0.0)
        dh2 = jax.lax.psum(dh2, axis)
        dgates = jax.lax.psum(dgates, axis)
        return dh2, dgates, dw1, dw2

    def _fwd_vjp(h2, gates, w1, w2):
        out, res = _fwd(h2, gates, w1, w2)
        return out, res

    f.defvjp(_fwd_vjp, _bwd)
    return f


def _is_expert_path(path) -> bool:
    """True for the expert-sharded leaves (blocks[i].moe.{w1,w2})."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return "moe" in keys and keys[-1] in ("w1", "w2")


def moe_train_step_ep(params: Dict, tokens: jax.Array, mesh, *,
                      n_heads: int, top_k: int = 2, lr: float = 1e-2,
                      aux_weight: float = 0.01, axis: str = "ep",
                      clip_norm=None) -> Tuple[Dict, jax.Array]:
    """One SGD step with every block's experts SHARDED over ``mesh[axis]``.

    The whole loss (attention + routing + expert FFNs + CE) runs inside one
    shard_map body: expert weights arrive sharded on their leading
    (n_experts) dim, everything else replicated. Each device computes its
    local experts' gated contributions; one psum over ICI rebuilds the FFN
    output, and the custom-VJP `_ep_moe_ffn` psums the dh2/dgates
    cotangents so every replicated param's grad comes out identical (and
    correct) on all devices without differentiating any collective.

    Contract (tests/test_moe_model.py): loss and updated params allclose
    moe_train_step's on the same inputs.
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    E = params["blocks"][0]["moe"]["router"].shape[1]
    if E % n:
        raise ValueError(f"n_experts {E} not divisible by {axis}={n}")
    e_loc = E // n
    ffn = _ep_moe_ffn(axis, e_loc)

    def split_specs(p):
        """PartitionSpec pytree: expert tensors sharded on dim 0."""
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: P(axis) if _is_expert_path(path) else P(), p)

    pspecs = split_specs(params)

    def body(p, toks):
        def loss_fn(p):
            x = p["embed"][toks]
            aux = jnp.float32(0)
            B, S, D = x.shape
            for blk in p["blocks"]:
                h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
                qkv = linear(h.reshape(B * S, D), blk["wqkv"], blk["bqkv"])
                q, k, v = jnp.split(qkv.reshape(B, S, 3 * D), 3, axis=-1)

                def heads(t):
                    return t.reshape(B, S, n_heads, D // n_heads
                                     ).transpose(0, 2, 1, 3)

                o = attention(heads(q), heads(k), heads(v), causal=True)
                o = o.transpose(0, 2, 1, 3).reshape(B * S, D)
                x = x + linear(o, blk["wo"], blk["bo"]).reshape(B, S, D)

                h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
                h2 = h.reshape(B * S, D)
                moe = blk["moe"]
                logits = h2 @ moe["router"]
                gates = _topk_gates(logits, top_k)
                out = ffn(h2, gates, moe["w1"], moe["w2"])
                aux = aux + load_balance_loss(logits, gates)
                x = x + out.reshape(B, S, D)
            x = layer_norm(x, p["lnf_g"], p["lnf_b"])
            ce = lm_cross_entropy(x[:, :-1], p["embed"], toks[:, 1:])
            return ce + aux_weight * aux / len(p["blocks"])

        loss, grads = jax.value_and_grad(loss_fn)(p)
        if clip_norm is not None:
            # global norm across the SHARDED param tree: expert leaves
            # (w1/w2, e_loc experts per device) contribute their local
            # squares psum'd over ep — every element counted exactly once,
            # so the norm (and the clip) equals the single-device step's
            shard_mask = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map_with_path(
                    lambda path, _: _is_expert_path(path), grads))
            gl = jax.tree_util.tree_leaves(grads)
            loc = [jnp.sum(jnp.square(g.astype(jnp.float32)))
                   for g in gl]
            rep = sum((s for s, m in zip(loc, shard_mask) if not m),
                      jnp.float32(0))
            shd = sum((s for s, m in zip(loc, shard_mask) if m),
                      jnp.float32(0))
            norm = jnp.sqrt(rep + jax.lax.psum(shd, axis))
            scale = jnp.asarray(clip_norm, jnp.float32) / jnp.maximum(
                norm, clip_norm)
            grads = jax.tree.map(
                lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
                grads)
        new = jax.tree.map(lambda w, g: w - lr * g, p, grads)
        return new, loss

    mapped = jax.shard_map(
        body, mesh=mesh, in_specs=(pspecs, P()), out_specs=(pspecs, P()),
        check_vma=False)
    return mapped(params, tokens)
