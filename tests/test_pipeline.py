"""Pipeline-parallel tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.gemm.autodiff import linear
from laser_tpu.parallel import make_mesh
from laser_tpu.parallel.pipeline import pipeline_forward


@pytest.fixture(scope="module")
def mesh_pp4():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh({"pp": 4}, devices=jax.devices()[:4])


class TestPipeline:
    def test_matches_sequential(self, rng, mesh_pp4):
        S, D, mb, n_micro = 4, 16, 8, 6
        ws = rng.randn(S, D, D).astype(np.float32) * 0.3
        bs = rng.randn(S, D).astype(np.float32) * 0.1
        micro = rng.randn(n_micro, mb, D).astype(np.float32)

        def stage_fn(p, x):
            return linear(x, p["w"], p["b"], "tanh")

        got = pipeline_forward(stage_fn,
                               {"w": jnp.asarray(ws), "b": jnp.asarray(bs)},
                               jnp.asarray(micro), mesh_pp4)

        # sequential oracle: every microbatch through all 4 stages
        x = micro.astype(np.float64)
        for s in range(S):
            x = np.tanh(x @ ws[s].astype(np.float64) + bs[s])
        np.testing.assert_allclose(np.asarray(got), x, rtol=1e-4, atol=1e-5)

    def test_single_microbatch(self, rng, mesh_pp4):
        ws = rng.randn(4, 8, 8).astype(np.float32) * 0.3
        bs = np.zeros((4, 8), np.float32)
        micro = rng.randn(1, 4, 8).astype(np.float32)

        def stage_fn(p, x):
            return linear(x, p["w"], p["b"], None)

        got = pipeline_forward(stage_fn,
                               {"w": jnp.asarray(ws), "b": jnp.asarray(bs)},
                               jnp.asarray(micro), mesh_pp4)
        x = micro.astype(np.float64)
        for s in range(4):
            x = x @ ws[s].astype(np.float64)
        np.testing.assert_allclose(np.asarray(got), x, rtol=1e-4, atol=1e-5)
