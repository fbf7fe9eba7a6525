"""kops vocabulary + tensor init/copy parity tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops import kops
from laser_tpu.tensor import (TensorView, copy_from, deep_copy, set_zero)


class TestKops:
    def test_value_ops(self):
        assert kops.set_zero((2, 4)).sum() == 0
        np.testing.assert_array_equal(
            np.asarray(kops.broadcast(3.0, (2, 2), jnp.float32)),
            np.full((2, 2), 3.0, np.float32))
        np.testing.assert_allclose(
            np.asarray(kops.fma(jnp.asarray(2.0), jnp.asarray(3.0),
                                jnp.asarray(4.0))), 10.0)

    def test_iota_any_rank(self):
        i0 = np.asarray(kops.iota((3, 4), 0))
        i1 = np.asarray(kops.iota((3, 4), 1))
        np.testing.assert_array_equal(i0, np.arange(3)[:, None] * np.ones((1, 4)))
        np.testing.assert_array_equal(i1, np.ones((3, 1)) * np.arange(4))

    def test_bitcast_roundtrip(self):
        x = jnp.asarray([1.0, -2.5], jnp.float32)
        bits = kops.bitcast(x, jnp.int32)
        back = kops.bitcast(bits, jnp.float32)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_mxu_matmul_precision_contract(self, rng):
        a = jnp.asarray(rng.randn(64, 64), jnp.float32)
        b = jnp.asarray(rng.randn(64, 64), jnp.float32)
        got = np.asarray(kops.mxu_matmul(a, b), np.float64)
        want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
        assert np.abs(got - want).max() < 1e-3

    def test_lane_partials_and_fold(self, rng):
        x = jnp.asarray(rng.randn(64, 128), jnp.float32)
        p = kops.lane_partials(x)
        assert p.shape == (8, 128)
        np.testing.assert_allclose(float(kops.pairwise_fold(
            p.reshape(-1, 128).sum(-1, keepdims=True), jnp.add, 0.0)[0]),
            np.asarray(x, np.float64).sum(), rtol=1e-5)

    def test_pairwise_fold_non_pow2(self):
        x = jnp.arange(5.0)[:, None]
        out = kops.pairwise_fold(x, jnp.add, 0.0)
        assert float(out[0]) == 10.0


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
