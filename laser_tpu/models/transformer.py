"""Transformer encoder block built entirely on laser-tpu kernels.

Third model family (models/mlp.py, models/cnn.py): multi-head attention on
the blockwise flash kernel, fused RMS/LayerNorm, fused linear layers. This
is the "does everything compose" model: MXU GEMMs, online-softmax attention,
row-norm kernels, and residual arithmetic in one forward.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..ops.attention import attention_trainable as attention
from ..ops.gemm.autodiff import linear
from ..ops.norm import layer_norm

Params = Dict[str, jax.Array]


def init_transformer_block(key: jax.Array, d_model: int, n_heads: int,
                           d_ff: int, dtype=jnp.float32) -> Params:
    if d_model % n_heads:
        raise ValueError(f"d_model {d_model} not divisible by n_heads {n_heads}")
    ks = jax.random.split(key, 6)
    s = jnp.sqrt(1.0 / d_model).astype(dtype)
    return {
        "wqkv": jax.random.normal(ks[0], (d_model, 3 * d_model), dtype) * s,
        "bqkv": jnp.zeros((3 * d_model,), dtype),
        "wo": jax.random.normal(ks[1], (d_model, d_model), dtype) * s,
        "bo": jnp.zeros((d_model,), dtype),
        "w1": jax.random.normal(ks[2], (d_model, d_ff), dtype) * s,
        "b1": jnp.zeros((d_ff,), dtype),
        "w2": jax.random.normal(ks[3], (d_ff, d_model), dtype)
        * jnp.sqrt(1.0 / d_ff).astype(dtype),
        "b2": jnp.zeros((d_model,), dtype),
        "ln1_g": jnp.ones((d_model,), dtype),
        "ln1_b": jnp.zeros((d_model,), dtype),
        "ln2_g": jnp.ones((d_model,), dtype),
        "ln2_b": jnp.zeros((d_model,), dtype),
    }


def transformer_block(params: Params, x: jax.Array, *, n_heads: int,
                      causal: bool = True) -> jax.Array:
    """Pre-norm block: x + MHA(LN(x)); x + FFN(LN(x)). x: (B, S, D)."""
    B, S, D = x.shape
    hd = D // n_heads

    h = layer_norm(x, params["ln1_g"], params["ln1_b"])
    qkv = linear(h.reshape(B * S, D), params["wqkv"], params["bqkv"])
    q, k, v = jnp.split(qkv.reshape(B, S, 3 * D), 3, axis=-1)
    # (B, S, D) -> (B, H, S, hd)
    def heads(t):
        return t.reshape(B, S, n_heads, hd).transpose(0, 2, 1, 3)
    o = attention(heads(q), heads(k), heads(v), causal=causal)
    o = o.transpose(0, 2, 1, 3).reshape(B * S, D)
    x = x + linear(o, params["wo"], params["bo"]).reshape(B, S, D)

    h = layer_norm(x, params["ln2_g"], params["ln2_b"])
    f = linear(h.reshape(B * S, D), params["w1"], params["b1"], "gelu")
    x = x + linear(f, params["w2"], params["b2"]).reshape(B, S, D)
    return x


def init_transformer(key: jax.Array, *, n_layers: int, d_model: int,
                     n_heads: int, d_ff: int, vocab: int,
                     dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, n_layers + 2)
    return {
        "embed": jax.random.normal(keys[0], (vocab, d_model), dtype) * 0.02,
        "blocks": [init_transformer_block(keys[i + 1], d_model, n_heads, d_ff,
                                          dtype) for i in range(n_layers)],
        "lnf_g": jnp.ones((d_model,), dtype),
        "lnf_b": jnp.zeros((d_model,), dtype),
    }


def transformer_forward(params: Dict, tokens: jax.Array, *, n_heads: int,
                        causal: bool = True) -> jax.Array:
    """tokens (B, S) int32 -> logits (B, S, vocab)."""
    x = params["embed"][tokens]
    for blk in params["blocks"]:
        x = transformer_block(blk, x, n_heads=n_heads, causal=causal)
    x = layer_norm(x, params["lnf_g"], params["lnf_b"])
    B, S, D = x.shape
    from ..ops.gemm.autodiff import gemm_ad

    logits = gemm_ad(x.reshape(B * S, D), params["embed"], None, False, True)
    return logits.reshape(B, S, -1)


# ---------------------------------------------------------------------------
# Serving: greedy autoregressive decoding.
# ---------------------------------------------------------------------------

def greedy_decode(params: Dict, prompt: jax.Array, *, n_heads: int,
                  max_new_tokens: int) -> jax.Array:
    """Greedy decoding: append argmax tokens one at a time.

    Functional reference implementation: each step re-runs the full causal
    forward over the padded window (static shapes — jit-friendly; the
    KV-cached incremental path is the planned optimization). prompt (B, S0)
    int32 -> (B, S0 + max_new_tokens).
    """
    B, S0 = prompt.shape
    total = S0 + max_new_tokens
    tokens = jnp.zeros((B, total), jnp.int32)
    tokens = tokens.at[:, :S0].set(prompt)

    def step(i, tokens):
        logits = transformer_forward(params, tokens, n_heads=n_heads,
                                     causal=True)
        # position i-1 predicts token i; future positions are causally unseen
        nxt = jnp.argmax(
            jax.lax.dynamic_index_in_dim(logits, i - 1, axis=1,
                                         keepdims=False), axis=-1)
        return tokens.at[:, i].set(nxt.astype(jnp.int32))

    return jax.lax.fori_loop(S0, total, step, tokens)
