"""Expert-parallel MoE tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.parallel import make_mesh
from laser_tpu.parallel.moe import init_moe, moe_forward_dense, moe_layer


@pytest.fixture(scope="module")
def mesh_ep4():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh({"ep": 4}, devices=jax.devices()[:4])


class TestMoE:
    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_dense_oracle(self, rng, mesh_ep4, top_k):
        key = jax.random.PRNGKey(0)
        params = init_moe(key, n_experts=8, d_model=32, d_ff=64)
        x = jnp.asarray(rng.randn(16, 32).astype(np.float32))
        got = moe_layer(params, x, mesh_ep4, top_k=top_k)
        want = moe_forward_dense(params, x, top_k=top_k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_gates_sum_to_one(self, rng):
        from laser_tpu.parallel.moe import _topk_gates

        logits = jnp.asarray(rng.randn(10, 8).astype(np.float32))
        g = np.asarray(_topk_gates(logits, 2))
        np.testing.assert_allclose(g.sum(-1), 1.0, rtol=1e-5)
        assert ((g > 0).sum(-1) <= 2).all()

    def test_indivisible_raises(self, rng, mesh_ep4):
        key = jax.random.PRNGKey(0)
        params = init_moe(key, n_experts=6, d_model=16, d_ff=16)
        with pytest.raises(ValueError):
            moe_layer(params, jnp.zeros((4, 16)), mesh_ep4)


class TestSparseMoE:
    def test_matches_dense_top1_with_headroom(self, rng, mesh_ep4):
        """With capacity >> tokens nothing drops: sparse == dense top-1."""
        from laser_tpu.parallel.moe import moe_layer_sparse

        key = jax.random.PRNGKey(0)
        params = init_moe(key, n_experts=8, d_model=32, d_ff=64)
        x = jnp.asarray(np.random.RandomState(3).randn(32, 32)
                        .astype(np.float32))
        got = moe_layer_sparse(params, x, mesh_ep4, capacity_factor=64.0)
        want = moe_forward_dense(params, x, top_k=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_drops_produce_zero_rows(self, rng, mesh_ep4):
        """Tiny capacity: overflowing tokens must output exactly zero (not
        garbage) and kept tokens still match the dense value."""
        from laser_tpu.parallel.moe import moe_layer_sparse

        key = jax.random.PRNGKey(1)
        params = init_moe(key, n_experts=4, d_model=16, d_ff=16)
        x = jnp.asarray(np.random.RandomState(4).randn(64, 16)
                        .astype(np.float32))
        got = np.asarray(moe_layer_sparse(params, x, mesh_ep4,
                                          capacity_factor=0.2))
        want = np.asarray(moe_forward_dense(params, x, top_k=1))
        for t in range(64):
            row = got[t]
            if np.allclose(row, 0, atol=1e-7):
                continue  # dropped
            np.testing.assert_allclose(row, want[t], rtol=1e-4, atol=1e-5)
        # with capacity_factor 0.2 SOME tokens must have dropped
        assert (np.abs(got).sum(-1) < 1e-7).any()

    def test_topk2_matches_dense(self, rng, mesh_ep4):
        from laser_tpu.parallel.moe import moe_layer_sparse

        key = jax.random.PRNGKey(5)
        params = init_moe(key, n_experts=8, d_model=32, d_ff=64)
        x = jnp.asarray(np.random.RandomState(9).randn(32, 32)
                        .astype(np.float32))
        got = moe_layer_sparse(params, x, mesh_ep4, top_k=2,
                               capacity_factor=64.0)
        want = moe_forward_dense(params, x, top_k=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
