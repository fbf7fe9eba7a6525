"""Greedy speculative decoding: exactness and windowed verification.

The acceptance rule keeps proposals only while they match the target's own
argmax, so the output must be TOKEN-IDENTICAL to plain greedy decoding on
the target — for any draft model, any gamma.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.models.transformer import (decode_step, greedy_decode,
                                          init_decode_cache,
                                          init_transformer, prefill,
                                          speculative_decode_greedy,
                                          window_step)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0xC0FFEE)


@pytest.fixture(scope="module")
def target():
    return init_transformer(jax.random.PRNGKey(1), n_layers=2, d_model=128,
                            n_heads=8, d_ff=256, vocab=61)


@pytest.fixture(scope="module")
def draft():
    # smaller, independently initialized: realistic partial acceptance
    return init_transformer(jax.random.PRNGKey(2), n_layers=1, d_model=64,
                            n_heads=4, d_ff=128, vocab=61)


def test_window_step_matches_sequential_decode(rng, target):
    # one W-query window step == W sequential decode_steps (logits + cache)
    B, S0, W = 1, 6, 4
    prompt = jnp.asarray(rng.randint(0, 61, (B, S0)), jnp.int32)
    toks = jnp.asarray(rng.randint(0, 61, (B, W)), jnp.int32)
    cache0 = init_decode_cache(2, B, 8, 16, S0 + W + 1)
    _, cache0 = prefill(target, prompt, cache0, n_heads=8)

    lg_w, cache_w = window_step(target, cache0, toks, jnp.int32(S0),
                                n_heads=8)
    cache_s = cache0
    for i in range(W):
        lg_i, cache_s = decode_step(target, cache_s, toks[:, i],
                                    jnp.int32(S0 + i), n_heads=8)
        assert np.abs(np.asarray(lg_w[:, i] - lg_i)).max() < 1e-4
    assert np.abs(np.asarray(cache_w - cache_s)).max() < 1e-5


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_token_identical_independent_draft(rng, target, draft, gamma):
    prompt = jnp.asarray(rng.randint(0, 61, (1, 7)), jnp.int32)
    want = np.asarray(greedy_decode(target, prompt, n_heads=8,
                                    max_new_tokens=10))
    got = np.asarray(speculative_decode_greedy(
        target, draft, prompt, n_heads=8, draft_n_heads=4,
        max_new_tokens=10, gamma=gamma))
    assert np.array_equal(got, want), (got, want)


def test_token_identical_perfect_draft(rng, target):
    # draft == target: every proposal accepted; still exact
    prompt = jnp.asarray(rng.randint(0, 61, (1, 5)), jnp.int32)
    want = np.asarray(greedy_decode(target, prompt, n_heads=8,
                                    max_new_tokens=8))
    got = np.asarray(speculative_decode_greedy(
        target, target, prompt, n_heads=8, draft_n_heads=8,
        max_new_tokens=8, gamma=4))
    assert np.array_equal(got, want)


def test_rejects_batch(target, draft):
    with pytest.raises(ValueError):
        speculative_decode_greedy(
            target, draft, jnp.zeros((2, 4), jnp.int32), n_heads=8,
            draft_n_heads=4, max_new_tokens=4)
