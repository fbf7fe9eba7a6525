"""Fused norm kernels + transformer block tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.norm import layer_norm, rms_norm


def np_layer_norm(x, g=None, b=None, eps=1e-6):
    x64 = x.astype(np.float64)
    mean = x64.mean(-1, keepdims=True)
    var = ((x64 - mean) ** 2).mean(-1, keepdims=True)
    y = (x64 - mean) / np.sqrt(var + eps)
    if g is not None:
        y = y * g + (b if b is not None else 0)
    return y


class TestLayerNorm:
    @pytest.mark.parametrize("shape", [(8, 128), (5, 300), (2, 3, 64)])
    def test_vs_oracle(self, rng, shape):
        x = rng.randn(*shape).astype(np.float32) * 3
        got = np.asarray(layer_norm(x), np.float64)
        np.testing.assert_allclose(got, np_layer_norm(x), rtol=1e-4, atol=1e-5)

    def test_affine(self, rng):
        x = rng.randn(16, 96).astype(np.float32)
        g = rng.randn(96).astype(np.float32)
        b = rng.randn(96).astype(np.float32)
        got = np.asarray(layer_norm(x, g, b), np.float64)
        np.testing.assert_allclose(got, np_layer_norm(x, g, b), rtol=1e-4,
                                   atol=1e-5)

    def test_normalized_stats(self, rng):
        x = rng.randn(32, 256).astype(np.float32) * 10 + 5
        y = np.asarray(layer_norm(x))
        np.testing.assert_allclose(y.mean(-1), 0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1, atol=1e-3)


class TestRmsNorm:
    def test_vs_oracle(self, rng):
        x = rng.randn(12, 200).astype(np.float32)
        g = rng.randn(200).astype(np.float32)
        got = np.asarray(rms_norm(x, g), np.float64)
        x64 = x.astype(np.float64)
        want = x64 / np.sqrt((x64**2).mean(-1, keepdims=True) + 1e-6) * g
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestTransformer:
    def test_block_shapes_and_finite(self, rng):
        from laser_tpu.models.transformer import (init_transformer_block,
                                                  transformer_block)

        key = jax.random.PRNGKey(0)
        p = init_transformer_block(key, d_model=128, n_heads=2, d_ff=256)
        x = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32) * 0.1)
        y = transformer_block(p, x, n_heads=2, causal=True)
        assert y.shape == x.shape
        assert bool(jnp.isfinite(y).all())

    def test_forward_logits(self, rng):
        from laser_tpu.models.transformer import (init_transformer,
                                                  transformer_forward)

        key = jax.random.PRNGKey(1)
        params = init_transformer(key, n_layers=2, d_model=128, n_heads=2,
                                  d_ff=256, vocab=50)
        tokens = jnp.asarray(rng.randint(0, 50, (2, 32)))
        logits = transformer_forward(params, tokens, n_heads=2)
        assert logits.shape == (2, 32, 50)
        assert bool(jnp.isfinite(logits).all())

    def test_causal_prefix_invariance(self, rng):
        # causal model: logits at position t must not depend on tokens > t
        from laser_tpu.models.transformer import (init_transformer,
                                                  transformer_forward)

        key = jax.random.PRNGKey(2)
        params = init_transformer(key, n_layers=1, d_model=128, n_heads=2,
                                  d_ff=128, vocab=17)
        t1 = rng.randint(0, 17, (1, 16))
        t2 = t1.copy()
        t2[0, 10:] = (t2[0, 10:] + 1) % 17  # change the suffix
        l1 = transformer_forward(params, jnp.asarray(t1), n_heads=2)
        l2 = transformer_forward(params, jnp.asarray(t2), n_heads=2)
        np.testing.assert_allclose(np.asarray(l1)[0, :10],
                                   np.asarray(l2)[0, :10], rtol=1e-4,
                                   atol=1e-5)


class TestTransformerTraining:
    def test_loss_decreases(self, rng):
        """End-to-end training through flash attention, fused linears and
        layer_norm (custom VJPs + XLA autodiff compose)."""
        from laser_tpu.models.transformer import (init_transformer,
                                                  transformer_forward)

        key = jax.random.PRNGKey(3)
        params = init_transformer(key, n_layers=1, d_model=128, n_heads=2,
                                  d_ff=128, vocab=11)
        tokens = jnp.asarray(rng.randint(0, 11, (2, 16)))
        targets = jnp.asarray(rng.randint(0, 11, (2, 16)))

        def loss_fn(p):
            logits = transformer_forward(p, tokens, n_heads=2)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, targets[..., None], axis=-1))

        l0 = float(loss_fn(params))
        for _ in range(5):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g,
                                            params, grads)
        assert float(loss_fn(params)) < l0

    def test_train_step_chunked_loss(self, rng):
        """The family's own train step: AdamW + lm_cross_entropy (logits
        never materialized) matches the materialized-logits loss and
        learns."""
        from laser_tpu.models.transformer import (init_transformer,
                                                  transformer_forward,
                                                  transformer_lm_loss,
                                                  transformer_train_init,
                                                  transformer_train_step)

        params = init_transformer(jax.random.PRNGKey(4), n_layers=1,
                                  d_model=128, n_heads=2, d_ff=128,
                                  vocab=11)
        tokens = jnp.asarray(rng.randint(0, 11, (2, 16)))

        got = float(transformer_lm_loss(params, tokens, n_heads=2))
        lg = transformer_forward(params, tokens, n_heads=2)
        logp = jax.nn.log_softmax(lg[:, :-1].astype(jnp.float32), axis=-1)
        want = -jnp.mean(jnp.take_along_axis(logp, tokens[:, 1:, None], -1))
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

        opt = transformer_train_init(params)
        step = jax.jit(lambda p, o, t, i: transformer_train_step(
            p, o, t, i, n_heads=2, lr=3e-3))
        losses = []
        for i in range(8):
            params, opt, loss = step(params, opt, tokens, i + 1)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8, losses


class TestGreedyDecode:
    def test_deterministic_and_prefix_preserving(self, rng):
        from laser_tpu.models.transformer import greedy_decode, init_transformer

        key = jax.random.PRNGKey(7)
        params = init_transformer(key, n_layers=1, d_model=128, n_heads=2,
                                  d_ff=128, vocab=13)
        prompt = jnp.asarray(rng.randint(0, 13, (2, 5)))
        out = greedy_decode(params, prompt, n_heads=2, max_new_tokens=4)
        assert out.shape == (2, 9)
        np.testing.assert_array_equal(np.asarray(out)[:, :5],
                                      np.asarray(prompt))
        out2 = greedy_decode(params, prompt, n_heads=2, max_new_tokens=4)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_matches_stepwise_argmax(self, rng):
        """Decoded token i equals argmax of logits[i-1] on the grown prefix."""
        from laser_tpu.models.transformer import (greedy_decode,
                                                  init_transformer,
                                                  transformer_forward)

        key = jax.random.PRNGKey(8)
        params = init_transformer(key, n_layers=1, d_model=128, n_heads=2,
                                  d_ff=128, vocab=11)
        prompt = jnp.asarray(rng.randint(0, 11, (1, 4)))
        out = np.asarray(greedy_decode(params, prompt, n_heads=2,
                                       max_new_tokens=3))
        # manual recompute: thanks to causality, running the final sequence
        # once gives the same per-step logits the loop saw
        logits = np.asarray(transformer_forward(
            params, jnp.asarray(out), n_heads=2, causal=True))
        for i in range(4, 7):
            assert out[0, i] == logits[0, i - 1].argmax()


class TestCachedDecode:
    def test_matches_full_recompute(self, rng):
        from laser_tpu.models.transformer import (greedy_decode,
                                                  greedy_decode_cached,
                                                  init_transformer)

        key = jax.random.PRNGKey(9)
        params = init_transformer(key, n_layers=2, d_model=128, n_heads=2,
                                  d_ff=128, vocab=11)
        prompt = jnp.asarray(rng.randint(0, 11, (2, 5)))
        full = np.asarray(greedy_decode(params, prompt, n_heads=2,
                                        max_new_tokens=4))
        cached = np.asarray(greedy_decode_cached(params, prompt, n_heads=2,
                                                 max_new_tokens=4))
        np.testing.assert_array_equal(cached, full)

    def test_prefill_cache_matches_stepwise(self, rng):
        # the flash prefill must leave the cache exactly as S0 sequential
        # decode_steps would (same K/V per layer and position)
        from laser_tpu.models.transformer import (decode_step,
                                                  init_decode_cache,
                                                  init_transformer, prefill)

        key = jax.random.PRNGKey(3)
        params = init_transformer(key, n_layers=2, d_model=128, n_heads=2,
                                  d_ff=96, vocab=13)
        prompt = jnp.asarray(rng.randint(0, 13, (2, 6)))
        B, S0 = prompt.shape
        cache0 = init_decode_cache(2, B, 2, 64, 8)

        logits_p, cache_p = prefill(params, prompt, cache0, n_heads=2)

        cache_s = cache0
        for i in range(S0):
            logits_s, cache_s = decode_step(params, cache_s, prompt[:, i],
                                            jnp.int32(i), n_heads=2)
        np.testing.assert_allclose(np.asarray(cache_p[:, :, :, :S0]),
                                   np.asarray(cache_s[:, :, :, :S0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logits_p),
                                   np.asarray(logits_s), rtol=1e-3, atol=1e-4)


class TestTransformerTrainKnobs:
    def test_clip_and_accum_match_plain(self, rng):
        """accum=2 with a generous clip bound == the plain full-batch step
        (the clip scale is exactly 1 below the bound). Gradients are the
        tight check; post-AdamW params get a loose atol because at step 1
        the update is ~lr*sign(g), so microbatch summation order on the
        tied embedding's near-zero grad elements flips isolated updates
        by up to ~lr regardless of how exact the accumulation is."""
        from laser_tpu.models.transformer import (init_transformer,
                                                  transformer_lm_loss,
                                                  transformer_train_init,
                                                  transformer_train_step)
        from laser_tpu.ops.optim import accumulated_value_and_grad

        params = init_transformer(jax.random.PRNGKey(9), n_layers=1,
                                  d_model=128, n_heads=2, d_ff=128, vocab=11)
        opt = transformer_train_init(params)
        toks = jnp.asarray(rng.randint(0, 11, (4, 16)))

        def loss_fn(p, t):
            return transformer_lm_loss(p, t, n_heads=2)

        l0, g0 = jax.value_and_grad(loss_fn)(params, toks)
        l1, g1 = accumulated_value_and_grad(loss_fn, 2)(params, toks)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

        p0, _, _ = transformer_train_step(params, opt, toks, 1, n_heads=2,
                                          lr=3e-3)
        p1, _, _ = transformer_train_step(params, opt, toks, 1, n_heads=2,
                                          lr=3e-3, clip_norm=1e6, accum=2)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_tight_clip_bounds_update(self, rng):
        from laser_tpu.models.transformer import (init_transformer,
                                                  transformer_train_init,
                                                  transformer_train_step)

        params = init_transformer(jax.random.PRNGKey(10), n_layers=1,
                                  d_model=128, n_heads=2, d_ff=128, vocab=11)
        opt = transformer_train_init(params)
        toks = jnp.asarray(rng.randint(0, 11, (2, 16)))
        p1, _, loss = transformer_train_step(params, opt, toks, 1, n_heads=2,
                                             lr=1e-3, clip_norm=1e-3)
        assert np.isfinite(float(loss))
        d = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(params)))
        assert 0 < d < 1e-2
