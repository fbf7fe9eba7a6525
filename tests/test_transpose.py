"""Layout-kernel tests (swapaxes.nim coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt


class TestTranspose2D:
    @pytest.mark.parametrize("shape", [(128, 128), (256, 512), (100, 37),
                                       (7, 300), (1, 1)])
    def test_vs_numpy(self, rng, shape):
        x = rng.randn(*shape).astype(np.float32)
        got = lt.transpose2d(x)
        np.testing.assert_array_equal(np.asarray(got), x.T)

    def test_bf16(self, rng):
        x = jnp.asarray(rng.randn(64, 192), jnp.bfloat16)
        got = lt.transpose2d(x)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(x, np.float32).T)


class TestBatched:
    @pytest.mark.parametrize("shape", [(4, 64, 64), (3, 100, 50), (1, 5, 7)])
    def test_vs_numpy(self, rng, shape):
        x = rng.randn(*shape).astype(np.float32)
        got = lt.transpose2d_batched(x)
        np.testing.assert_array_equal(np.asarray(got), x.transpose(0, 2, 1))


class TestLayoutConversions:
    def test_nchw2nhwc(self, rng):
        x = rng.randn(2, 3, 16, 20).astype(np.float32)
        got = lt.nchw2nhwc(x)
        np.testing.assert_array_equal(np.asarray(got), x.transpose(0, 2, 3, 1))

    def test_nhwc2nchw(self, rng):
        x = rng.randn(2, 16, 20, 3).astype(np.float32)
        got = lt.nhwc2nchw(x)
        np.testing.assert_array_equal(np.asarray(got), x.transpose(0, 3, 1, 2))

    def test_roundtrip(self, rng):
        x = rng.randn(2, 5, 9, 11).astype(np.float32)
        back = lt.nhwc2nchw(lt.nchw2nhwc(x))
        np.testing.assert_array_equal(np.asarray(back), x)
