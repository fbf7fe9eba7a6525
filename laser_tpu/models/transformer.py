"""Transformer encoder block built entirely on laser-tpu kernels.

Third model family (models/mlp.py, models/cnn.py): multi-head attention on
the blockwise flash kernel, fused RMS/LayerNorm, fused linear layers. This
is the "does everything compose" model: MXU GEMMs, online-softmax attention,
row-norm kernels, and residual arithmetic in one forward.
"""

from __future__ import annotations

from typing import Dict

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


# ---------------------------------------------------------------------------
# Serving: KV-cached incremental decoding.
# ---------------------------------------------------------------------------

def init_decode_cache(n_layers: int, B: int, n_heads: int, head_dim: int,
                      max_len: int, dtype=jnp.float32):
    """Per-layer K/V caches shaped (B*H, max_len, hd)."""
    z = jnp.zeros((n_layers, 2, B * n_heads, max_len, head_dim), dtype)
    return z


def decode_step(params: Dict, cache: jax.Array, token: jax.Array,
                pos: jax.Array, *, n_heads: int):
    """One incremental decode step.

    token (B,) int32, pos scalar int32 (0-based position being written).
    Returns (logits (B, vocab), updated cache). Decode attention is a
    masked matvec over the cache (Sq=1 leaves the MXU idle either way —
    the flash kernel is the PREFILL path, this is the latency path).
    """
    import math as _math

    B = token.shape[0]
    D = params["embed"].shape[1]
    hd = D // n_heads
    scale = 1.0 / _math.sqrt(hd)
    x = params["embed"][token][:, None, :]  # (B, 1, D)

    new_cache = cache
    for li, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = linear(h.reshape(B, D), blk["wqkv"], blk["bqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, D) -> (B*H, 1, hd)
            return t.reshape(B, n_heads, hd).reshape(B * n_heads, 1, hd)

        q, k, v = heads(q), heads(k), heads(v)
        kc = jax.lax.dynamic_update_slice(new_cache[li, 0], k, (0, pos, 0))
        vc = jax.lax.dynamic_update_slice(new_cache[li, 1], v, (0, pos, 0))
        new_cache = new_cache.at[li, 0].set(kc).at[li, 1].set(vc)
        # masked matvec attention over the cache
        s = jnp.einsum("bqd,bkd->bqk", q, kc,
                       precision=jax.lax.Precision.HIGHEST) * scale
        kpos = jnp.arange(kc.shape[1])[None, None, :]
        s = jnp.where(kpos <= pos, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bqk,bkd->bqd", p, vc,
                       precision=jax.lax.Precision.HIGHEST)
        o = o.reshape(B, n_heads, hd).reshape(B, D)
        x = x + linear(o, blk["wo"], blk["bo"]).reshape(B, 1, D)

        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        f = linear(h.reshape(B, D), blk["w1"], blk["b1"], "gelu")
        x = x + linear(f, blk["w2"], blk["b2"]).reshape(B, 1, D)

    x = layer_norm(x, params["lnf_g"], params["lnf_b"])
    from ..ops.gemm.autodiff import gemm_ad

    logits = gemm_ad(x.reshape(B, D), params["embed"], None, False, True)
    return logits, new_cache


def prefill(params: Dict, prompt: jax.Array, cache: jax.Array, *,
            n_heads: int):
    """ONE flash-attention forward over the whole prompt that also writes
    every prompt position's K/V into the decode cache.

    This is the serving prefill path: cost ~= one causal forward (the flash
    kernel on the MXU), vs the round-1 behavior of S0 sequential
    ``decode_step`` matvecs. Returns (last-position logits (B, vocab),
    updated cache).
    """
    B, S0 = prompt.shape
    D = params["embed"].shape[1]
    hd = D // n_heads
    x = params["embed"][prompt]  # (B, S0, D)

    for li, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = linear(h.reshape(B * S0, D), blk["wqkv"], blk["bqkv"])
        q, k, v = jnp.split(qkv.reshape(B, S0, 3 * D), 3, axis=-1)

        def heads(t):  # (B, S0, D) -> (B, H, S0, hd)
            return t.reshape(B, S0, n_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        # write the prompt K/V into the cache (positions [0, S0))
        cache = cache.at[li, 0, :, :S0, :].set(
            kh.reshape(B * n_heads, S0, hd))
        cache = cache.at[li, 1, :, :S0, :].set(
            vh.reshape(B * n_heads, S0, hd))
        o = attention(qh, kh, vh, causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(B * S0, D)
        x = x + linear(o, blk["wo"], blk["bo"]).reshape(B, S0, D)

        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        f = linear(h.reshape(B * S0, D), blk["w1"], blk["b1"], "gelu")
        x = x + linear(f, blk["w2"], blk["b2"]).reshape(B, S0, D)

    x = layer_norm(x[:, -1, :], params["lnf_g"], params["lnf_b"])
    from ..ops.gemm.autodiff import gemm_ad

    logits = gemm_ad(x.reshape(B, D), params["embed"], None, False, True)
    return logits, cache


def greedy_decode_cached(params: Dict, prompt: jax.Array, *, n_heads: int,
                         max_new_tokens: int) -> jax.Array:
    """KV-cached greedy decoding: ONE flash prefill forward over the prompt
    (writing the cache), then incremental ``decode_step`` generation.
    Produces exactly the same tokens as ``greedy_decode``."""
    B, S0 = prompt.shape
    D = params["embed"].shape[1]
    total = S0 + max_new_tokens
    cache = init_decode_cache(len(params["blocks"]), B, n_heads,
                              D // n_heads, total, params["embed"].dtype)
    tokens = jnp.zeros((B, total), jnp.int32)
    tokens = tokens.at[:, :S0].set(prompt)

    logits, cache = prefill(params, prompt, cache, n_heads=n_heads)
    tokens = tokens.at[:, S0].set(jnp.argmax(logits, -1).astype(jnp.int32))

    def step(i, carry):
        tokens, cache = carry
        tok = jax.lax.dynamic_index_in_dim(tokens, i, axis=1, keepdims=False)
        logits, cache = decode_step(params, cache, tok, i, n_heads=n_heads)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, nxt, i + 1, axis=1)
        return tokens, cache

    tokens, _ = jax.lax.fori_loop(S0, total - 1, step, (tokens, cache))
    return tokens


def sample_decode_cached(params: Dict, prompt: jax.Array, key: jax.Array, *,
                         n_heads: int, max_new_tokens: int,
                         temperature: float = 1.0, top_k: int = 0,
                         top_p: float = 1.0) -> jax.Array:
    """Stochastic serving: flash prefill + KV-cached sampling decode with
    temperature / top-k / nucleus filtering (ops/sampling.py:sample_logits).
    temperature=0 reduces to ``greedy_decode_cached``."""
    from ..ops.sampling import sample_logits

    B, S0 = prompt.shape
    D = params["embed"].shape[1]
    total = S0 + max_new_tokens
    cache = init_decode_cache(len(params["blocks"]), B, n_heads,
                              D // n_heads, total, params["embed"].dtype)
    tokens = jnp.zeros((B, total), jnp.int32)
    tokens = tokens.at[:, :S0].set(prompt)

    logits, cache = prefill(params, prompt, cache, n_heads=n_heads)
    tokens = tokens.at[:, S0].set(sample_logits(
        jax.random.fold_in(key, S0), logits, temperature=temperature,
        top_k=top_k, top_p=top_p))

    def step(i, carry):
        tokens, cache = carry
        tok = jax.lax.dynamic_index_in_dim(tokens, i, axis=1, keepdims=False)
        logits, cache = decode_step(params, cache, tok, i, n_heads=n_heads)
        nxt = sample_logits(jax.random.fold_in(key, i + 1), logits,
                            temperature=temperature, top_k=top_k,
                            top_p=top_p)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, nxt, i + 1, axis=1)
        return tokens, cache

    tokens, _ = jax.lax.fori_loop(S0, total - 1, step, (tokens, cache))
    return tokens
