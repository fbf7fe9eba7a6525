"""Model-layer tests: CNN forward, checkpoint save/restore."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from laser_tpu.models.cnn import cnn_forward, cnn_predict, init_cnn, mean_pool2x2
from laser_tpu.models.mlp import init_mlp


class TestCNN:
    def test_forward_shapes(self, rng):
        key = jax.random.PRNGKey(0)
        params = init_cnn(key, in_channels=3, conv_channels=(8, 16),
                          hidden=32, num_classes=10, image_hw=32)
        x = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
        logits = cnn_forward(params, x)
        assert logits.shape == (4, 10)
        probs = cnn_predict(params, x)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)

    def test_mean_pool(self, rng):
        x = rng.randn(2, 3, 4, 4).astype(np.float32)
        got = np.asarray(mean_pool2x2(jnp.asarray(x)))
        want = x.reshape(2, 3, 2, 2, 2, 2).mean(axis=(3, 5))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_vs_lax_conv_stack(self, rng):
        # one conv block must equal the XLA conv + relu + pool composition
        key = jax.random.PRNGKey(1)
        params = init_cnn(key, in_channels=2, conv_channels=(4,), hidden=8,
                          num_classes=3, image_hw=8)
        x = jnp.asarray(rng.randn(2, 2, 8, 8).astype(np.float32))
        w, b = params[0]["w"], params[0]["b"]
        ours = mean_pool2x2(jnp.maximum(
            __import__("laser_tpu").conv2d_direct(x, w, padding=(1, 1))
            + b[None, :, None, None], 0))
        ref = mean_pool2x2(jnp.maximum(jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST) + b[None, :, None, None], 0))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        params = init_mlp(key, [8, 16, 4])
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt")
            save_checkpoint(p, params, step=7, metadata={"note": "test"})
            restored = load_checkpoint(p, like=params)
            for a, b in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(restored)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            _, side = load_checkpoint(p)
            assert side["step"] == 7
            assert side["metadata"]["note"] == "test"

    def test_refuses_packed(self):
        import laser_tpu as lt
        from laser_tpu.ops.gemm import GemmTiles

        tiles = GemmTiles(128, 128, 128, 1 << 24)
        packed = lt.gemm_prepack_b(jnp.ones((8, 8), jnp.float32), tiles=tiles)
        with tempfile.TemporaryDirectory() as d:
            with pytest.raises(ValueError, match="packed"):
                save_checkpoint(os.path.join(d, "bad"), {"w": packed})


class TestTrainState:
    def test_save_load_roundtrip(self, rng, tmp_path):
        import laser_tpu as lt
        from laser_tpu.models.checkpoint import (load_train_state,
                                                 save_train_state)

        params = {"w": jnp.asarray(rng.randn(8, 16), jnp.float32),
                  "b": jnp.asarray(rng.randn(16), jnp.float32)}
        m, v = lt.adamw_init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        params, m, v = lt.adamw_step(params, g, m, v, 1, lr=1e-2)
        p = str(tmp_path / "state")
        save_train_state(p, params, m, v, step=1)
        p2, m2, v2, step = load_train_state(p, params)
        assert step == 1
        for k in params:
            np.testing.assert_array_equal(np.asarray(p2[k]),
                                          np.asarray(params[k]))
            np.testing.assert_array_equal(np.asarray(m2[k]),
                                          np.asarray(m[k]))
