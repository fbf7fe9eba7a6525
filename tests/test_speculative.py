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


# -- sampled (rejection) speculative decoding ---------------------------------


class TestSpeculativeSampled:
    def test_accept_resample_is_distribution_exact(self):
        """The theorem of arXiv:2211.17192: for ANY draft q, the first
        emitted token of one speculative round is marginally ~ p_0 (the
        target). Certified empirically: 200k vmapped rounds with a
        deliberately BAD draft, compare the empirical marginal to p_0."""
        from laser_tpu.ops.sampling import speculative_accept

        V, gamma = 8, 3
        kk = jax.random.split(jax.random.PRNGKey(7), 2 * (gamma + 1))
        p = jax.nn.softmax(3.0 * jax.random.normal(kk[0], (gamma + 1, V)))
        q = jax.nn.softmax(3.0 * jax.random.normal(kk[1], (gamma, V)))

        def one_round(key):
            kp, ka = jax.random.split(key)
            prop = jax.vmap(
                lambda k, row: jax.random.categorical(k, jnp.log(row)))(
                    jax.random.split(kp, gamma), q).astype(jnp.int32)
            n_acc, nxt = speculative_accept(ka, p, q, prop)
            return jnp.where(n_acc >= 1, prop[0], nxt)

        n = 200_000
        toks = jax.jit(jax.vmap(one_round))(
            jax.random.split(jax.random.PRNGKey(123), n))
        emp = np.bincount(np.asarray(toks), minlength=V) / n
        want = np.asarray(p[0])
        np.testing.assert_allclose(emp, want, atol=4e-3,
                                   err_msg=f"emp={emp} want={want}")

    def test_full_accept_bonus_row(self):
        """q == p and proposals with p(x)>0: every position accepts
        (u·q < p is u < 1), n_acc == gamma, bonus from p[gamma]."""
        from laser_tpu.ops.sampling import speculative_accept

        V, gamma = 8, 3
        p = jnp.full((gamma + 1, V), 1.0 / V)
        q = jnp.full((gamma, V), 1.0 / V)
        prop = jnp.array([1, 2, 3], jnp.int32)
        n_acc, nxt = speculative_accept(jax.random.PRNGKey(0), p, q, prop)
        assert int(n_acc) == gamma
        assert 0 <= int(nxt) < V

    def test_certain_rejection_resamples_residual(self):
        """q puts all mass on token 0, p puts none there: position 0
        must reject and the resample must come from p's support."""
        from laser_tpu.ops.sampling import speculative_accept

        V, gamma = 8, 2
        q = jnp.zeros((gamma, V)).at[:, 0].set(1.0)
        p = jnp.zeros((gamma + 1, V)).at[:, 1:].set(1.0 / (V - 1))
        prop = jnp.zeros((gamma,), jnp.int32)
        n_acc, nxt = speculative_accept(jax.random.PRNGKey(3), p, q, prop)
        assert int(n_acc) == 0
        assert int(nxt) != 0

    def test_sharp_temperature_matches_greedy(self, target, draft):
        """temperature -> 0+: p and q collapse to argmax one-hots, every
        round reduces to the greedy acceptance rule — the sampled decoder
        must emit exactly what the GREEDY speculative decoder emits (the
        comparator shares the window_step numerics, so near-tie argmax
        positions can't flip between paths; greedy-speculative itself is
        certified == greedy_decode above)."""
        from laser_tpu.models.transformer import (speculative_decode,
                                                  speculative_decode_greedy)

        prompt = jnp.asarray(
            np.random.RandomState(105).randint(0, 61, (1, 5)))
        want = np.asarray(speculative_decode_greedy(
            target, draft, prompt, n_heads=8, draft_n_heads=4,
            max_new_tokens=12, gamma=3))
        got = np.asarray(speculative_decode(
            target, draft, prompt, jax.random.PRNGKey(9), n_heads=8,
            draft_n_heads=4, max_new_tokens=12, gamma=3,
            temperature=5e-4))
        np.testing.assert_array_equal(got, want)

    def test_sampled_deterministic_and_valid(self, target, draft, rng):
        from laser_tpu.models.transformer import speculative_decode

        prompt = jnp.asarray(rng.randint(0, 61, (1, 4)))
        a = np.asarray(speculative_decode(
            target, draft, prompt, jax.random.PRNGKey(5), n_heads=8,
            draft_n_heads=4, max_new_tokens=10, gamma=4))
        b = np.asarray(speculative_decode(
            target, draft, prompt, jax.random.PRNGKey(5), n_heads=8,
            draft_n_heads=4, max_new_tokens=10, gamma=4))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (1, 14)
        np.testing.assert_array_equal(a[:, :4], np.asarray(prompt))
        assert ((a >= 0) & (a < 61)).all()

    def test_rejects_bad_args(self, target, draft):
        from laser_tpu.models.transformer import speculative_decode

        with pytest.raises(ValueError, match="temperature"):
            speculative_decode(target, draft, jnp.zeros((1, 3), jnp.int32),
                               jax.random.PRNGKey(0), n_heads=8,
                               draft_n_heads=4, max_new_tokens=4,
                               temperature=0.0)
        with pytest.raises(ValueError, match="gamma"):
            speculative_decode(target, draft, jnp.zeros((1, 3), jnp.int32),
                               jax.random.PRNGKey(0), n_heads=8,
                               draft_n_heads=4, max_new_tokens=4, gamma=0)


# -- llama family --------------------------------------------------------------


class TestLlamaSpeculative:
    CFG_T = dict(n_layers=2, d_model=128, n_heads=4, n_kv_heads=2,
                 d_ff=96, vocab=61, max_len=96)
    CFG_D = dict(n_layers=1, d_model=64, n_heads=2, n_kv_heads=1,
                 d_ff=64, vocab=61, max_len=96)

    @pytest.fixture(scope="class")
    def ltarget(self):
        from laser_tpu.models.llama import init_llama
        return init_llama(jax.random.PRNGKey(11), **self.CFG_T)

    @pytest.fixture(scope="class")
    def ldraft(self):
        from laser_tpu.models.llama import init_llama
        return init_llama(jax.random.PRNGKey(12), **self.CFG_D)

    def test_window_step_matches_sequential(self, ltarget, rng):
        from laser_tpu.models.llama import (init_llama_cache,
                                            llama_decode_step,
                                            llama_prefill,
                                            llama_window_step)

        S0, W = 5, 4
        prompt = jnp.asarray(rng.randint(0, 61, (1, S0)))
        nxt = jnp.asarray(rng.randint(0, 61, (1, W)))

        c0 = init_llama_cache(ltarget, 1, S0 + W + 2, n_heads=4,
                              n_kv_heads=2)
        _, cw = llama_prefill(ltarget, prompt, c0, n_heads=4, n_kv_heads=2)
        lg_w, cw = llama_window_step(ltarget, cw, nxt, S0, n_heads=4,
                                     n_kv_heads=2)

        _, cs = llama_prefill(ltarget, prompt, c0, n_heads=4, n_kv_heads=2)
        for i in range(W):
            lg_s, cs = llama_decode_step(ltarget, cs, nxt[:, i], S0 + i,
                                         n_heads=4, n_kv_heads=2)
            np.testing.assert_allclose(np.asarray(lg_w[:, i]),
                                       np.asarray(lg_s),
                                       rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cw), np.asarray(cs),
                                   rtol=1e-4, atol=1e-5)

    def test_greedy_token_identical(self, ltarget, ldraft):
        from laser_tpu.models.llama import (llama_generate,
                                            llama_speculative_decode_greedy)

        prompt = jnp.asarray(
            np.random.RandomState(101).randint(0, 61, (1, 5)))
        want = np.asarray(llama_generate(
            ltarget, prompt, jax.random.PRNGKey(0), n_heads=4,
            n_kv_heads=2, max_new_tokens=12, temperature=0.0))
        got = np.asarray(llama_speculative_decode_greedy(
            ltarget, ldraft, prompt, n_heads=4, n_kv_heads=2,
            draft_n_heads=2, draft_n_kv_heads=1, max_new_tokens=12,
            gamma=3))
        np.testing.assert_array_equal(got, want)

    def test_greedy_windowed_token_identical(self, ltarget, ldraft):
        from laser_tpu.models.llama import (llama_generate,
                                            llama_speculative_decode_greedy)

        prompt = jnp.asarray(
            np.random.RandomState(102).randint(0, 61, (1, 6)))
        want = np.asarray(llama_generate(
            ltarget, prompt, jax.random.PRNGKey(0), n_heads=4,
            n_kv_heads=2, max_new_tokens=10, temperature=0.0, window=4))
        got = np.asarray(llama_speculative_decode_greedy(
            ltarget, ldraft, prompt, n_heads=4, n_kv_heads=2,
            draft_n_heads=2, draft_n_kv_heads=1, max_new_tokens=10,
            gamma=3, window=4))
        np.testing.assert_array_equal(got, want)

    def test_sampled_sharp_temperature_matches_greedy(self, ltarget,
                                                      ldraft):
        # comparator = greedy-SPECULATIVE (same window_step numerics:
        # a near-tie argmax can't flip between paths), itself certified
        # == llama_generate(temperature=0) above; order-independent
        # prompt (not the shared rng fixture)
        from laser_tpu.models.llama import (
            llama_speculative_decode, llama_speculative_decode_greedy)

        prompt = jnp.asarray(
            np.random.RandomState(103).randint(0, 61, (1, 5)))
        want = np.asarray(llama_speculative_decode_greedy(
            ltarget, ldraft, prompt, n_heads=4, n_kv_heads=2,
            draft_n_heads=2, draft_n_kv_heads=1, max_new_tokens=10,
            gamma=3))
        got = np.asarray(llama_speculative_decode(
            ltarget, ldraft, prompt, jax.random.PRNGKey(8), n_heads=4,
            n_kv_heads=2, draft_n_heads=2, draft_n_kv_heads=1,
            max_new_tokens=10, gamma=3, temperature=5e-4))
        np.testing.assert_array_equal(got, want)

    def test_sampled_deterministic(self, ltarget, ldraft):
        from laser_tpu.models.llama import llama_speculative_decode

        prompt = jnp.asarray(
            np.random.RandomState(104).randint(0, 61, (1, 4)))
        a = np.asarray(llama_speculative_decode(
            ltarget, ldraft, prompt, jax.random.PRNGKey(5), n_heads=4,
            n_kv_heads=2, draft_n_heads=2, draft_n_kv_heads=1,
            max_new_tokens=8, gamma=4))
        b = np.asarray(llama_speculative_decode(
            ltarget, ldraft, prompt, jax.random.PRNGKey(5), n_heads=4,
            n_kv_heads=2, draft_n_heads=2, draft_n_kv_heads=1,
            max_new_tokens=8, gamma=4))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (1, 12)
        np.testing.assert_array_equal(a[:, :4], np.asarray(prompt))
