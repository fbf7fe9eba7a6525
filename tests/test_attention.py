"""Blockwise fused attention tests vs the XLA reference oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.attention import attention, attention_reference


def make_qkv(rng, shape, dtype=np.float32):
    q = rng.randn(*shape).astype(dtype)
    k = rng.randn(*shape).astype(dtype)
    v = rng.randn(*shape).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestAttention:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("shape", [(2, 256, 128), (1, 512, 128),
                                       (2, 2, 128, 128)])
    def test_vs_reference(self, rng, shape, causal):
        q, k, v = make_qkv(rng, shape)
        got = attention(q, k, v, causal=causal, block_q=128, block_k=128)
        want = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_unaligned_seq(self, rng, causal):
        # S=200 forces internal padding + key masking
        q, k, v = make_qkv(rng, (1, 200, 128))
        got = attention(q, k, v, causal=causal, block_q=128, block_k=128)
        want = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_scale_override(self, rng):
        q, k, v = make_qkv(rng, (1, 128, 128))
        got = attention(q, k, v, scale=0.5, block_q=128, block_k=128)
        want = attention_reference(q, k, v, scale=0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_rows_are_convex_combinations(self, rng):
        # each output row must lie within [min(v), max(v)] per dim
        q, k, v = make_qkv(rng, (1, 256, 128))
        got = np.asarray(attention(q, k, v, block_q=128, block_k=128))
        assert got.max() <= np.asarray(v).max() + 1e-4
        assert got.min() >= np.asarray(v).min() - 1e-4

    def test_shape_mismatch(self, rng):
        q, k, v = make_qkv(rng, (1, 128, 128))
        with pytest.raises(ValueError):
            attention(q, k, v[:, :64])

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("D", [64, 96])
    def test_small_head_dim_flash_path(self, rng, D, causal):
        # D=64/96 are zero-padded to 128 lanes inside the flash kernel —
        # the flash path must stay exact, never the O(S^2) fallback
        q, k, v = make_qkv(rng, (2, 256, D))
        got = attention(q, k, v, causal=causal, block_q=128, block_k=128)
        want = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_k_valid_mid_block_masking(self, rng):
        # k_valid cutting a key block mid-way must match attention over the
        # truncated key set exactly (masked p entries zeroed in-kernel)
        from laser_tpu.ops.attention import attention_with_stats

        q, k, v = make_qkv(rng, (1, 256, 128))
        out, m, l = attention_with_stats(q, k, v, k_valid=100,
                                         block_q=128, block_k=128)
        want = attention_reference(q, k[:, :100], v[:, :100])
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_k_valid_nonpositive_rejected(self, rng):
        from laser_tpu.ops.attention import attention_with_stats

        q, k, v = make_qkv(rng, (1, 128, 128))
        with pytest.raises(ValueError):
            attention_with_stats(q, k, v, k_valid=0)


class TestTrainable:
    def test_grads_match_reference(self, rng):
        from laser_tpu.ops.attention import attention_trainable

        q, k, v = make_qkv(rng, (1, 128, 128))

        def f(q, k, v):
            return jnp.sum(attention_trainable(q, k, v, causal=True) ** 2)

        def ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_unaligned_and_batched(self, rng, causal):
        from laser_tpu.ops.attention import attention_trainable

        q, k, v = make_qkv(rng, (2, 200, 128))  # forces padding

        def f(q, k, v):
            return jnp.sum(attention_trainable(
                q, k, v, causal=causal, block_q=128, block_k=128) ** 2)

        def ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=causal) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("D", [64, 96])
    def test_grads_small_head_dim(self, rng, D):
        # flash fwd+bwd through the zero-padded head dim
        from laser_tpu.ops.attention import attention_trainable

        q, k, v = make_qkv(rng, (2, 128, D))

        def f(q, k, v):
            return jnp.sum(attention_trainable(q, k, v, causal=True) ** 2)

        def ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)

    def test_grads_finite_no_nans(self, rng):
        from laser_tpu.ops.attention import attention_trainable

        q, k, v = make_qkv(rng, (1, 130, 128))  # heavy padding
        g = jax.grad(lambda q, k, v: jnp.sum(
            attention_trainable(q, k, v, causal=True, block_q=128,
                                block_k=128)))(q, k, v)
        for t in g:
            assert bool(jnp.isfinite(t).all())


class TestGQA:
    def gqa_reference(self, q, k, v, causal):
        B, Hq, S, D = q.shape
        Hkv = k.shape[1]
        ke = jnp.repeat(k, Hq // Hkv, axis=1)
        ve = jnp.repeat(v, Hq // Hkv, axis=1)
        return attention_reference(q, ke, ve, causal=causal)

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("heads", [(8, 2), (4, 1), (4, 4)])
    def test_vs_expanded_reference(self, rng, heads, causal):
        from laser_tpu.ops.attention import attention_gqa

        Hq, Hkv = heads
        q = jnp.asarray(rng.randn(2, Hq, 128, 64).astype(np.float32) * 0.4)
        k = jnp.asarray(rng.randn(2, Hkv, 128, 64).astype(np.float32) * 0.4)
        v = jnp.asarray(rng.randn(2, Hkv, 128, 64).astype(np.float32) * 0.4)
        got = attention_gqa(q, k, v, causal=causal, block_q=64, block_k=128)
        want = self.gqa_reference(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_shape_validation(self, rng):
        from laser_tpu.ops.attention import attention_gqa

        q = jnp.zeros((1, 6, 64, 64), jnp.float32)
        k = jnp.zeros((1, 4, 64, 64), jnp.float32)
        with pytest.raises(ValueError):
            attention_gqa(q, k, k)  # 6 % 4 != 0

    def test_grads_match_expanded(self, rng):
        from laser_tpu.ops.attention import attention_gqa_trainable

        q = jnp.asarray(rng.randn(1, 4, 128, 64).astype(np.float32) * 0.4)
        k = jnp.asarray(rng.randn(1, 2, 128, 64).astype(np.float32) * 0.4)
        v = jnp.asarray(rng.randn(1, 2, 128, 64).astype(np.float32) * 0.4)

        def f(q, k, v):
            return jnp.sum(attention_gqa_trainable(q, k, v, causal=True) ** 2)

        def ref(q, k, v):
            return jnp.sum(self.gqa_reference(q, k, v, True) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for gg, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)


class TestSlidingWindow:
    """Sliding-window attention: row i sees keys (i - window, i]. Blocks
    entirely past the window are skipped, so the first processed block of a
    late query row can be fully masked — the p-mask case the plain causal
    path never hits."""

    @pytest.mark.parametrize("window", [1, 40, 100, 200, 1000])
    def test_vs_reference(self, rng, window):
        q, k, v = make_qkv(rng, (2, 384, 128))
        got = attention(q, k, v, causal=True, window=window,
                        block_q=128, block_k=128)
        want = attention_reference(q, k, v, causal=True, window=window)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_window_one_returns_v(self, rng):
        # window=1: every row attends only itself -> output == v
        q, k, v = make_qkv(rng, (1, 256, 128))
        got = attention(q, k, v, causal=True, window=1,
                        block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(v),
                                   rtol=2e-5, atol=2e-5)

    def test_unaligned_seq_and_head_dim(self, rng):
        q, k, v = make_qkv(rng, (2, 200, 64))
        got = attention(q, k, v, causal=True, window=37,
                        block_q=128, block_k=128)
        want = attention_reference(q, k, v, causal=True, window=37)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gqa_window(self, rng):
        from laser_tpu.ops.attention import attention_gqa

        B, Hq, Hkv, S, D = 2, 4, 2, 256, 128
        q = jnp.asarray(rng.randn(B, Hq, S, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, Hkv, S, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, Hkv, S, D), jnp.float32)
        got = attention_gqa(q, k, v, causal=True, window=60,
                            block_q=128, block_k=128)
        ke = jnp.repeat(k, Hq // Hkv, axis=1)
        ve = jnp.repeat(v, Hq // Hkv, axis=1)
        want = attention_reference(q, ke, ve, causal=True, window=60)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_match_reference(self, rng):
        from laser_tpu.ops.attention import attention_trainable

        q, k, v = make_qkv(rng, (2, 256, 128))
        W = 70

        def f(q, k, v):
            return jnp.sum(attention_trainable(
                q, k, v, causal=True, window=W,
                block_q=128, block_k=128) ** 2)

        def ref(q, k, v):
            return jnp.sum(attention_reference(
                q, k, v, causal=True, window=W) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for gg, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)

    def test_gqa_trainable_window(self, rng):
        from laser_tpu.ops.attention import attention_gqa_trainable

        B, Hq, Hkv, S, D = 1, 4, 2, 256, 128
        q = jnp.asarray(rng.randn(B, Hq, S, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, Hkv, S, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, Hkv, S, D), jnp.float32)
        W = 50

        def f(q, k, v):
            return jnp.sum(attention_gqa_trainable(
                q, k, v, causal=True, window=W,
                block_q=128, block_k=128) ** 2)

        def ref(q, k, v):
            ke = jnp.repeat(k, Hq // Hkv, axis=1)
            ve = jnp.repeat(v, Hq // Hkv, axis=1)
            return jnp.sum(attention_reference(
                q, ke, ve, causal=True, window=W) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for gg, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                       rtol=1e-4, atol=1e-4)

    def test_validation(self, rng):
        q, k, v = make_qkv(rng, (1, 128, 128))
        with pytest.raises(ValueError, match="requires causal"):
            attention(q, k, v, causal=False, window=16)
        with pytest.raises(ValueError, match=">= 1"):
            attention(q, k, v, causal=True, window=0)


class TestUnalignedPanelCoverage:
    """bf16 S in (1280, 1536): round_step_up(S, 128) lands between the
    1024 q-block and the 2048 default K panel (e.g. S=1500 -> bq=1024,
    bk=1536). Two shipped bugs lived here: the default 1024-chunk did not
    divide bk (build-time crash), and SP = round_step_up(S, max(bq, bk))
    = 1536 is not a multiple of bq, so the grid never visited query rows
    >= 1024 (silent garbage). SP is now the max of PER-AXIS roundings and
    the default chunk is forced to a divisor of bk."""

    @pytest.mark.parametrize("S", [1300, 1500])
    @pytest.mark.parametrize("causal", [False, True])
    def test_forward_covers_all_rows(self, rng, S, causal):
        q, k, v = (jnp.asarray(rng.randn(1, S, 64) * 0.3, jnp.bfloat16)
                   for _ in range(3))
        got = np.asarray(attention(q, k, v, causal=causal), np.float32)
        want = np.asarray(attention_reference(q, k, v, causal=causal),
                          np.float32)
        assert np.abs(got - want).max() < 2e-2
        # the original failure mode: rows >= 1024 specifically
        assert np.abs(got[:, 1024:] - want[:, 1024:]).max() < 2e-2

    def test_grads_cover_all_rows(self, rng):
        S = 1500
        q, k, v = (jnp.asarray(rng.randn(1, S, 64) * 0.3, jnp.bfloat16)
                   for _ in range(3))

        from laser_tpu.ops.attention import attention_trainable

        def f(q, k, v):
            return jnp.sum(attention_trainable(q, k, v, causal=True) ** 2)

        def ref(q, k, v):
            o = attention_reference(q, k, v, causal=True)
            return jnp.sum(o.astype(jnp.bfloat16).astype(jnp.float32) ** 2)

        got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for g, w in zip(got, want):
            g = np.asarray(g, np.float32)
            w = np.asarray(w, np.float32)
            assert np.abs(g - w).max() / max(np.abs(w).max(), 1e-9) < 4e-2
