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

    def test_indivisible_raises(self, rng, mesh_sp4):
        q, k, v = make_qkv(rng, (1, 130, 128))
        with pytest.raises(ValueError):
            ring_attention(q, k, v, mesh_sp4)
