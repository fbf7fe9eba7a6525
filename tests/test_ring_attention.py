"""Ring (sequence-parallel) attention vs the single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.attention import attention_reference, attention_with_stats
from laser_tpu.parallel import make_mesh
from laser_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh_sp4():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh({"sp": 4}, devices=jax.devices()[:4])


def make_qkv(rng, shape):
    return (jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.4)
            for _ in range(3))


class TestStats:
    def test_merge_identity(self, rng):
        # full attention == merge of two half-key attentions
        from laser_tpu.parallel.ring_attention import _merge

        q, k, v = make_qkv(rng, (1, 128, 128))
        o_full = attention_reference(q, k, v)
        o1, m1, l1 = attention_with_stats(q, k[:, :64], v[:, :64])
        o2, m2, l2 = attention_with_stats(q, k[:, 64:], v[:, 64:])
        o, _, _ = _merge(o1, m1.astype(jnp.float32), l1.astype(jnp.float32),
                         o2, m2.astype(jnp.float32), l2.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_full),
                                   rtol=2e-5, atol=2e-5)


class TestRing:
    @pytest.mark.parametrize("causal", [False, True])
    def test_vs_reference(self, rng, mesh_sp4, causal):
        B, S, D = 2, 512, 128
        q, k, v = make_qkv(rng, (B, S, D))
        got = ring_attention(q, k, v, mesh_sp4, causal=causal,
                             block_q=128, block_k=128)
        want = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_vs_reference(self, rng, mesh_sp4, causal):
        # sequence-parallel TRAINING: jax.grad through the ring (fused flash
        # backward per chunk, grads rotated home) vs the single-device oracle
        q, k, v = make_qkv(rng, (2, 256, 128))

        def ring_loss(q, k, v):
            o = ring_attention(q, k, v, mesh_sp4, causal=causal,
                               block_q=64, block_k=128)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def ref_loss(q, k, v):
            o = attention_reference(q, k, v, causal=causal)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        got = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-4, atol=2e-4)

    def test_single_pass_causal_stats(self, rng):
        # global-offset causal kernel: a past chunk must equal the full
        # (non-causal) result and a future chunk must contribute nothing
        q, k, v = make_qkv(rng, (1, 128, 128))
        o_full, m_full, l_full = attention_with_stats(q, k, v, causal=False)
        # q chunk at global rows [128, 256), k chunk at [0, 128): all past
        o_p, m_p, l_p = attention_with_stats(q, k, v, causal=True,
                                             q_offset=jnp.int32(128),
                                             k_offset=jnp.int32(0))
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_full),
                                   rtol=2e-5, atol=2e-5)
        # q chunk at [0, 128), k chunk at [128, 256): all future -> l == 0
        o_f, m_f, l_f = attention_with_stats(q, k, v, causal=True,
                                             q_offset=jnp.int32(0),
                                             k_offset=jnp.int32(128))
        assert float(jnp.abs(o_f).max()) == 0.0
        assert float(jnp.abs(l_f).max()) == 0.0

    def test_indivisible_raises(self, rng, mesh_sp4):
        q, k, v = make_qkv(rng, (1, 130, 128))
        with pytest.raises(ValueError):
            ring_attention(q, k, v, mesh_sp4)
