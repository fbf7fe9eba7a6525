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
                      causal: bool = True, window=None) -> jax.Array:
    """Pre-norm block: x + MHA(LN(x)); x + FFN(LN(x)). x: (B, S, D).

    ``window``: sliding-window attention (requires causal) — position i
    attends keys (i - window, i]."""
    B, S, D = x.shape
    hd = D // n_heads

    h = layer_norm(x, params["ln1_g"], params["ln1_b"])
    qkv = linear(h.reshape(B * S, D), params["wqkv"], params["bqkv"])
    q, k, v = jnp.split(qkv.reshape(B, S, 3 * D), 3, axis=-1)
    # (B, S, D) -> (B, H, S, hd)
    def heads(t):
        return t.reshape(B, S, n_heads, hd).transpose(0, 2, 1, 3)
    o = attention(heads(q), heads(k), heads(v), causal=causal,
                  window=window)
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


def transformer_hidden(params: Dict, tokens: jax.Array, *, n_heads: int,
                       causal: bool = True, window=None) -> jax.Array:
    """tokens (B, S) int32 -> final-norm hidden states (B, S, D)."""
    x = params["embed"][tokens]
    for blk in params["blocks"]:
        x = transformer_block(blk, x, n_heads=n_heads, causal=causal,
                              window=window)
    return layer_norm(x, params["lnf_g"], params["lnf_b"])


def transformer_forward(params: Dict, tokens: jax.Array, *, n_heads: int,
                        causal: bool = True, window=None) -> jax.Array:
    """tokens (B, S) int32 -> logits (B, S, vocab)."""
    x = transformer_hidden(params, tokens, n_heads=n_heads, causal=causal,
                           window=window)
    B, S, D = x.shape
    from ..ops.gemm.autodiff import gemm_ad

    logits = gemm_ad(x.reshape(B * S, D), params["embed"], None, False, True)
    return logits.reshape(B, S, -1)


# ---------------------------------------------------------------------------
# Training: chunked-vocab LM loss (tied embedding) + fused AdamW.
# ---------------------------------------------------------------------------

def transformer_lm_loss(params: Dict, tokens: jax.Array, *, n_heads: int,
                        window=None,
                        label_smoothing: float = 0.0,
                        ignore_index=None) -> jax.Array:
    """Next-token cross entropy through the tied (vocab, D) embedding.
    The unembedding and the loss run as ONE chunked-vocab pass
    (ops/loss.py:lm_cross_entropy): the (B·S, vocab) logits are never
    materialized in the training step, forward or backward.

    ignore_index: masked targets contribute zero loss/grad and such
    tokens are clamped to 0 before the embedding lookup (see
    data/loader.py:PackedTokenDataset)."""
    from ..ops.loss import lm_cross_entropy

    targets = tokens[:, 1:]
    if ignore_index is not None:
        tokens = jnp.where(tokens == ignore_index, 0, tokens)
    x = transformer_hidden(params, tokens, n_heads=n_heads, causal=True,
                           window=window)
    return lm_cross_entropy(x[:, :-1], params["embed"], targets,
                            label_smoothing=label_smoothing,
                            ignore_index=ignore_index)


def transformer_train_init(params: Dict):
    """AdamW state (m, v) matching ``params`` (everything trains)."""
    from ..ops.optim import adamw_init

    return adamw_init(params)


def transformer_train_step(params: Dict, opt_state, tokens: jax.Array,
                           step, *, n_heads: int, lr=1e-3,
                           weight_decay: float = 0.0, window=None,
                           label_smoothing: float = 0.0, clip_norm=None,
                           accum: int = 1, ignore_index=None):
    """One fused-AdamW step; returns (new_params, new_opt_state, loss).
    Jittable; ``step`` is the 1-based count, ``lr`` may be traced (e.g.
    ops/optim.py:warmup_cosine_lr). clip_norm: global-L2 gradient
    clipping; accum: gradient accumulation over sequentially-scanned
    microbatches — the same knobs as models/llama.py:llama_train_step."""
    from ..ops.optim import (accumulated_value_and_grad, adamw_step,
                             clip_by_global_norm)

    def loss_fn(p, toks):
        return transformer_lm_loss(p, toks, n_heads=n_heads, window=window,
                                   label_smoothing=label_smoothing,
                                   ignore_index=ignore_index)

    loss, grads = accumulated_value_and_grad(loss_fn, accum)(params, tokens)
    if clip_norm is not None:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    m, v = opt_state
    new_params, m2, v2 = adamw_step(params, grads, m, v, step, lr=lr,
                                    weight_decay=weight_decay)
    return new_params, (m2, v2), loss


# ---------------------------------------------------------------------------
# Serving: greedy autoregressive decoding.
# ---------------------------------------------------------------------------

def greedy_decode(params: Dict, prompt: jax.Array, *, n_heads: int,
                  max_new_tokens: int, window=None) -> jax.Array:
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
                                     causal=True, window=window)
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


def window_step(params: Dict, cache: jax.Array, tokens: jax.Array,
                pos: jax.Array, *, n_heads: int):
    """W-query decode step: process a WINDOW of W tokens at positions
    [pos, pos+W), writing their K/V into the cache and attending each query
    causally over cache[0 .. pos+i]. The verification forward of
    speculative decoding (W = gamma+1); decode_step is the W=1 case.

    tokens (B, W) int32 -> (logits (B, W, vocab), cache)."""
    import math as _math

    B, W = tokens.shape
    D = params["embed"].shape[1]
    hd = D // n_heads
    scale = 1.0 / _math.sqrt(hd)
    x = params["embed"][tokens]  # (B, W, D)

    for li, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = linear(h.reshape(B * W, D), blk["wqkv"], blk["bqkv"])
        q, k, v = jnp.split(qkv.reshape(B, W, 3 * D), 3, axis=-1)

        def heads(t):  # (B, W, D) -> (B*H, W, hd)
            return t.reshape(B, W, n_heads, hd).transpose(
                0, 2, 1, 3).reshape(B * n_heads, W, hd)

        q, k, v = heads(q), heads(k), heads(v)
        kc = jax.lax.dynamic_update_slice(cache[li, 0], k, (0, pos, 0))
        vc = jax.lax.dynamic_update_slice(cache[li, 1], v, (0, pos, 0))
        cache = cache.at[li, 0].set(kc).at[li, 1].set(vc)
        s = jnp.einsum("bqd,bkd->bqk", q, kc,
                       precision=jax.lax.Precision.HIGHEST) * scale
        kpos = jnp.arange(kc.shape[1])[None, None, :]
        qpos = pos + jnp.arange(W)[None, :, None]
        s = jnp.where(kpos <= qpos, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bqk,bkd->bqd", p, vc,
                       precision=jax.lax.Precision.HIGHEST)
        o = o.reshape(B, n_heads, W, hd).transpose(0, 2, 1, 3)
        x = x + linear(o.reshape(B * W, D), blk["wo"],
                       blk["bo"]).reshape(B, W, D)

        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        f = linear(h.reshape(B * W, D), blk["w1"], blk["b1"], "gelu")
        x = x + linear(f, blk["w2"], blk["b2"]).reshape(B, W, D)

    x = layer_norm(x, params["lnf_g"], params["lnf_b"])
    from ..ops.gemm.autodiff import gemm_ad

    logits = gemm_ad(x.reshape(B * W, D), params["embed"], None, False, True)
    return logits.reshape(B, W, -1), cache


def _spec_adapter(params: Dict, n_heads: int) -> Dict:
    """models/speculative.py adapter for this family (MHA, tied embed)."""
    D = params["embed"].shape[1]
    return dict(
        vocab=params["embed"].shape[0],
        init_cache=lambda B, cap: init_decode_cache(
            len(params["blocks"]), B, n_heads, D // n_heads, cap,
            params["embed"].dtype),
        prefill=lambda prompt, cache: prefill(params, prompt, cache,
                                              n_heads=n_heads),
        decode=lambda cache, tok, pos: decode_step(params, cache, tok, pos,
                                                   n_heads=n_heads),
        window=lambda cache, toks, pos: window_step(params, cache, toks,
                                                    pos, n_heads=n_heads),
    )


def speculative_decode_greedy(target_params: Dict, draft_params: Dict,
                              prompt: jax.Array, *, n_heads: int,
                              draft_n_heads: int, max_new_tokens: int,
                              gamma: int = 4) -> jax.Array:
    """Greedy speculative decoding: a small DRAFT model proposes ``gamma``
    tokens with cheap cached steps; the TARGET model scores the whole
    window in ONE ``window_step`` forward and keeps the longest proposal
    prefix matching its own argmax, plus one bonus token from its logits at
    the first disagreement. Token-IDENTICAL to ``greedy_decode`` on the
    target (greedy acceptance is exact), with target-forward count shrunk
    by the mean accepted length. The loop (incl. the rollback-free cache
    design) lives in models/speculative.py:speculative_generate."""
    from .speculative import speculative_generate

    return speculative_generate(
        _spec_adapter(target_params, n_heads),
        _spec_adapter(draft_params, draft_n_heads), prompt,
        max_new_tokens=max_new_tokens, gamma=gamma, greedy=True)


def speculative_decode(target_params: Dict, draft_params: Dict,
                       prompt: jax.Array, key: jax.Array, *, n_heads: int,
                       draft_n_heads: int, max_new_tokens: int,
                       gamma: int = 4,
                       temperature: float = 1.0) -> jax.Array:
    """SAMPLED speculative decoding — the rejection-sampling scheme of
    arXiv:2211.17192: the draft proposes ``gamma`` sampled tokens (cheap
    cached steps, recording its distribution q_i at each), the target
    scores the window in ONE ``window_step`` forward, and
    ``ops/sampling.py:speculative_accept`` keeps the exact-distribution
    prefix + one residual/bonus token. Every emitted token is marginally
    distributed EXACTLY as temperature-sampling the target alone — for
    ANY draft; the draft's quality only moves the accept length (the
    speed), never the distribution. ``temperature`` scales BOTH models'
    logits; it must be > 0 — at 0 rejection sampling degenerates, use
    the greedy variant."""
    from .speculative import speculative_generate

    return speculative_generate(
        _spec_adapter(target_params, n_heads),
        _spec_adapter(draft_params, draft_n_heads), prompt, key,
        max_new_tokens=max_new_tokens, gamma=gamma,
        temperature=temperature)


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
