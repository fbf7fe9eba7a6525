"""Multinomial-sampling tests (random_sampling bench parity)."""

import jax
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
