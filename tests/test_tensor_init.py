"""Tensor init/copy parity tests (initialization.nim:34-202 analog)."""

import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.tensor import TensorView, copy_from, deep_copy, set_zero


class TestTensorInitParity:
    def test_deep_copy_strided(self, rng):
        a = rng.randn(8, 6).astype(np.float32)
        v = TensorView.from_array(jnp.asarray(a)).transpose()
        np.testing.assert_array_equal(np.asarray(deep_copy(v)), a.T)

    def test_set_zero(self):
        z = set_zero(jnp.ones((3, 4), jnp.bfloat16))
        assert z.dtype == jnp.bfloat16 and float(jnp.sum(z)) == 0

    def test_copy_from(self, rng):
        dst = jnp.zeros((4, 4), jnp.float32)
        src = rng.randn(4, 4).astype(np.float64)
        out = copy_from(dst, jnp.asarray(src, jnp.float32))
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), src.astype(np.float32))

    def test_copy_from_mismatch(self):
        with pytest.raises(ValueError):
            copy_from(jnp.zeros((2, 2)), jnp.zeros((3, 3)))
