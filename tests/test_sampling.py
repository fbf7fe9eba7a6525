"""Multinomial-sampling tests (random_sampling bench parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt


class TestWithReplacement:
    def test_distribution(self):
        key = jax.random.PRNGKey(0xDEADBEEF)
        w = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
        n = 40_000
        s = np.asarray(lt.sample_multinomial(key, w, n))
        freq = np.bincount(s, minlength=4) / n
        np.testing.assert_allclose(freq, w / w.sum(), atol=0.02)

    def test_determinism(self):
        key = jax.random.PRNGKey(7)
        w = np.random.RandomState(0).rand(50_000).astype(np.float32)
        a = np.asarray(lt.sample_multinomial(key, w, 1000))
        b = np.asarray(lt.sample_multinomial(key, w, 1000))
        np.testing.assert_array_equal(a, b)

    def test_zero_weight_never_sampled(self):
        key = jax.random.PRNGKey(3)
        w = np.asarray([0.0, 1.0, 0.0, 1.0], np.float32)
        s = np.asarray(lt.sample_multinomial(key, w, 10_000))
        assert set(np.unique(s)) <= {1, 3}


class TestWithoutReplacement:
    def test_unique(self):
        key = jax.random.PRNGKey(1)
        w = np.random.RandomState(1).rand(1000).astype(np.float32)
        s = np.asarray(lt.sample_multinomial(key, w, 10, replacement=False))
        assert len(set(s.tolist())) == 10

    def test_respects_weights(self):
        # category with ~all the mass must always be in the without-replacement draw
        key = jax.random.PRNGKey(2)
        w = np.ones(100, np.float32) * 1e-4
        w[42] = 1e4
        hits = 0
        for i in range(50):
            k = jax.random.fold_in(key, i)
            s = np.asarray(lt.sample_multinomial(k, w, 5, replacement=False))
            hits += 42 in s
        assert hits == 50

    def test_batched(self):
        key = jax.random.PRNGKey(5)
        w = np.random.RandomState(2).rand(4, 300).astype(np.float32)
        s = np.asarray(lt.sample_multinomial_batch(key, w, 8, replacement=False))
        assert s.shape == (4, 8)
        for row in s:
            assert len(set(row.tolist())) == 8


def test_batch_alias():
    from laser_tpu.ops.sampling import sample_multinomial_batch
    assert lt.sample_multinomial is not None
    assert sample_multinomial_batch is not None


class TestSampleLogits:
    def test_greedy_at_zero_temperature(self, rng):
        from laser_tpu.ops.sampling import sample_logits

        logits = jnp.asarray(rng.randn(4, 100), jnp.float32)
        out = sample_logits(jax.random.PRNGKey(0), logits, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(logits).argmax(-1))

    def test_top_k_restricts_support(self, rng):
        from laser_tpu.ops.sampling import sample_logits

        logits = jnp.asarray(rng.randn(2, 50), jnp.float32)
        top5 = np.argsort(np.asarray(logits), -1)[:, -5:]
        for i in range(20):
            out = np.asarray(sample_logits(jax.random.PRNGKey(i), logits,
                                           top_k=5))
            for b in range(2):
                assert out[b] in top5[b]

    def test_top_p_keeps_head_token(self):
        from laser_tpu.ops.sampling import sample_logits

        # one dominant token: top_p=0.5 must always pick it
        logits = jnp.asarray(np.array([[10.0] + [0.0] * 9], np.float32))
        for i in range(10):
            out = sample_logits(jax.random.PRNGKey(i), logits, top_p=0.5)
            assert int(out[0]) == 0

    def test_temperature_sharpens(self, rng):
        from laser_tpu.ops.sampling import sample_logits

        logits = jnp.asarray(rng.randn(1, 30) * 2, jnp.float32)
        best = int(np.asarray(logits).argmax())
        hits = sum(int(sample_logits(jax.random.PRNGKey(i), logits,
                                     temperature=0.05)[0]) == best
                   for i in range(20))
        assert hits >= 19  # near-greedy at low temperature

    def test_distribution_matches_softmax(self, rng):
        from laser_tpu.ops.sampling import sample_logits

        logits = jnp.asarray(rng.randn(1, 8), jnp.float32)
        draws = jax.vmap(lambda k: sample_logits(k, logits)[0])(
            jax.random.split(jax.random.PRNGKey(0), 4000))
        emp = np.bincount(np.asarray(draws), minlength=8) / 4000
        want = np.asarray(jax.nn.softmax(logits[0]))
        assert np.abs(emp - want).max() < 0.05


class TestSampleDecode:
    def test_zero_temperature_equals_greedy(self, rng):
        from laser_tpu.models.transformer import (greedy_decode_cached,
                                                  init_transformer,
                                                  sample_decode_cached)

        params = init_transformer(jax.random.PRNGKey(5), n_layers=1,
                                  d_model=128, n_heads=2, d_ff=128, vocab=17)
        prompt = jnp.asarray(rng.randint(0, 17, (2, 4)))
        g = greedy_decode_cached(params, prompt, n_heads=2, max_new_tokens=3)
        s = sample_decode_cached(params, prompt, jax.random.PRNGKey(0),
                                 n_heads=2, max_new_tokens=3, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(s))

    def test_stochastic_decoding_runs(self, rng):
        from laser_tpu.models.transformer import (init_transformer,
                                                  sample_decode_cached)

        params = init_transformer(jax.random.PRNGKey(5), n_layers=1,
                                  d_model=128, n_heads=2, d_ff=128, vocab=17)
        prompt = jnp.asarray(rng.randint(0, 17, (2, 4)))
        out = sample_decode_cached(params, prompt, jax.random.PRNGKey(1),
                                   n_heads=2, max_new_tokens=4,
                                   temperature=0.8, top_k=10, top_p=0.9)
        assert out.shape == (2, 8)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 17).all()
