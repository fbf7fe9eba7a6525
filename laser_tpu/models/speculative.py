"""Model-agnostic speculative decoding loop.

One loop serves both model families (transformer, llama) and both
acceptance rules:

- greedy (arXiv:2302.01318-style verification): keep the longest proposal
  prefix matching the target's own argmax — token-IDENTICAL to greedy
  decoding on the target alone;
- sampled (arXiv:2211.17192 rejection scheme, via
  ops/sampling.py:speculative_accept): every emitted token marginally
  EXACTLY temperature-sampled from the target alone.

A model plugs in as an adapter dict:

    vocab       int
    init_cache  (B, cap) -> cache pytree
    prefill     (prompt (B,S0), cache) -> (logits (B,V), cache)
    decode      (cache, token (B,), pos) -> (logits (B,V), cache)
    window      (cache, tokens (B,W), pos) -> (logits (B,W,V), cache)

The cache-rollback trick is family-independent: rejected positions need
no cache surgery — both caches' rows past the accepted point are
overwritten the next time those positions are (re)filled, so the
position pointer is the only rollback state.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def speculative_generate(target: Dict, draft: Dict, prompt: jax.Array,
                         key: Optional[jax.Array] = None, *,
                         max_new_tokens: int, gamma: int = 4,
                         temperature: float = 1.0,
                         greedy: bool = False) -> jax.Array:
    """Draft proposes ``gamma`` cheap cached steps; the target scores the
    whole window in ONE W-query forward; the acceptance rule keeps a
    prefix and emits one extra token, so every round advances >= 1.

    prompt (1, S0) — speculative decoding is the per-sequence latency
    path; batch rows would advance unevenly."""
    B, S0 = prompt.shape
    if B != 1:
        raise ValueError("speculative decoding is single-sequence (B=1)")
    if gamma < 1:
        raise ValueError("gamma must be >= 1")
    if not greedy and temperature <= 0:
        raise ValueError("temperature must be > 0; use greedy=True for "
                         "greedy decoding")
    from ..ops.sampling import speculative_accept

    total = S0 + max_new_tokens
    cap = total + gamma + 1  # window writes may overshoot before clamping
    V = target["vocab"]
    inv_t = 1.0 if greedy else 1.0 / temperature
    if key is None:
        key = jax.random.PRNGKey(0)  # greedy path: carried but unused

    tcache = target["init_cache"](B, cap)
    dcache = draft["init_cache"](B, cap)
    tokens = jnp.zeros((B, cap), jnp.int32).at[:, :S0].set(prompt)

    tlog, tcache = target["prefill"](prompt, tcache)
    key, k0 = jax.random.split(key)
    if greedy:
        first = jnp.argmax(tlog, -1).astype(jnp.int32)
    else:
        first = jax.random.categorical(
            k0, tlog.astype(jnp.float32) * inv_t, -1).astype(jnp.int32)
    tokens = tokens.at[:, S0].set(first)

    def body(carry):
        tokens, tcache, dcache, pos, key = carry
        # pos = index of the newest ACCEPTED token (its K/V not yet cached)
        key, kd, kv_ = jax.random.split(key, 3)

        # -- draft: gamma proposals with cheap cached steps. gamma+1
        # steps (not gamma): the extra step caches the LAST proposal's
        # K/V so that after a full accept the draft's history is complete
        # up to the new position (its surplus proposal is unused and
        # overwritten by the bonus/next round).
        def dstep(i, c):
            toks, dcache, qbuf = c
            tok = jax.lax.dynamic_index_in_dim(toks, pos + i, 1, False)
            lg, dcache = draft["decode"](dcache, tok, pos + i)
            if greedy:
                nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            else:
                lg32 = lg.astype(jnp.float32) * inv_t
                qbuf = jax.lax.cond(
                    i < gamma,
                    lambda b: jax.lax.dynamic_update_index_in_dim(
                        b, jax.nn.softmax(lg32[0]),
                        jnp.minimum(i, gamma - 1), 0),
                    lambda b: b, qbuf)
                nxt = jax.random.categorical(
                    jax.random.fold_in(kd, i), lg32, -1).astype(jnp.int32)
            toks = jax.lax.dynamic_update_index_in_dim(
                toks, nxt, pos + i + 1, axis=1)
            return toks, dcache, qbuf

        qbuf = jnp.zeros((gamma, V), jnp.float32)
        tokens, dcache, qbuf = jax.lax.fori_loop(
            0, gamma + 1, dstep, (tokens, dcache, qbuf))

        # -- target: verify the whole window in one forward
        window = jax.lax.dynamic_slice_in_dim(tokens, pos, gamma + 1, 1)
        tlog, tcache = target["window"](tcache, window, pos)
        prop = window[0, 1:]  # proposal i sits at window position i+1

        if greedy:
            gre = jnp.argmax(tlog, -1).astype(jnp.int32)  # (1, gamma+1)
            match = prop == gre[0, :gamma]
            n_acc = jnp.argmin(jnp.concatenate(
                [match, jnp.array([False])])).astype(jnp.int32)
            # bonus: the target's argmax at the first mismatch (or after a
            # full accept) — always valid, so every round emits >= 1 token
            nxt = gre[:, n_acc]
        else:
            pprob = jax.nn.softmax(tlog[0].astype(jnp.float32) * inv_t, -1)
            n_acc, nxt = speculative_accept(kv_, pprob, qbuf, prop)
            nxt = nxt[None]

        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, nxt, pos + n_acc + 1, axis=1)
        return tokens, tcache, dcache, pos + n_acc + 1, key

    def cond(carry):
        return carry[3] < total - 1

    tokens, _, _, _, _ = jax.lax.while_loop(
        cond, body, (tokens, tcache, dcache, jnp.int32(S0), key))
    return tokens[:, :total]
