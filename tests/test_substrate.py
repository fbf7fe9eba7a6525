"""Substrate tests: device_info, TensorView, error metrics, registry."""

import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.device_info import (GENERATION_TABLE, classify_device_kind,
                                   detect, min_tile)
from laser_tpu.tensor import TensorView, row_major_strides
from laser_tpu.utils import (mean_relative_error, relative_error,
                             round_step_down, round_step_up)


class TestDeviceInfo:
    def test_classify(self):
        assert classify_device_kind("TPU v5 lite") == "v5e"
        assert classify_device_kind("TPU v5e") == "v5e"
        assert classify_device_kind("TPU v5p") == "v5p"
        assert classify_device_kind("TPU v4") == "v4"
        assert classify_device_kind("TPU v6 lite") == "v6e"
        assert classify_device_kind("Trillium") == "v6e"
        assert classify_device_kind("cpu") == "cpu-sim"

    def test_detect_runs(self):
        spec = detect()
        assert spec.generation in GENERATION_TABLE
        assert spec.vmem_bytes > 0

    def test_min_tile(self):
        assert min_tile(jnp.float32) == (8, 128)
        assert min_tile(jnp.bfloat16) == (16, 128)
        assert min_tile(jnp.int8) == (32, 128)


class TestTensorView:
    def test_row_major_strides(self):
        # (reference: initialization.nim:24-40)
        assert row_major_strides((2, 3, 4)) == (12, 4, 1)
        assert row_major_strides(()) == ()

    def test_contiguity_ignores_size1(self):
        # (reference: datatypes.nim:38-47 — rank-1 dims don't break contiguity)
        buf = jnp.arange(12.0)
        v = TensorView(buf, (3, 1, 4), (4, 999, 1))
        assert v.is_c_contiguous()
        v2 = TensorView(buf, (3, 4), (1, 3))  # fortran order
        assert not v2.is_c_contiguous()

    def test_transpose_materialize(self):
        a = np.arange(24.0, dtype=np.float32).reshape(4, 6)
        v = TensorView.from_array(jnp.asarray(a)).transpose()
        assert not v.is_c_contiguous()
        np.testing.assert_array_equal(np.asarray(v.materialize()), a.T)

    def test_slice_strided(self):
        a = np.arange(40.0, dtype=np.float32).reshape(8, 5)
        v = TensorView.from_array(jnp.asarray(a)).slice(slice(1, 8, 2), slice(0, 4, 2))
        np.testing.assert_array_equal(np.asarray(v.materialize()), a[1:8:2, 0:4:2])

    def test_matrix_view(self):
        # every-2nd-row view, the strided GEMM scenario (README.md:211-213)
        a = np.arange(48.0, dtype=np.float32).reshape(8, 6)
        v = TensorView.matrix(jnp.asarray(a), 4, 6, 12, 1)
        np.testing.assert_array_equal(np.asarray(v.materialize()), a[::2])

    def test_views_never_mutate(self):
        # The analog of test_tensor_immutability.nim:10-24: JAX buffers are
        # immutable; materializing a view must not alias-and-modify.
        buf = jnp.arange(6.0)
        v = TensorView(buf, (2, 3), (3, 1))
        _ = v.materialize() + 100
        np.testing.assert_array_equal(np.asarray(buf), np.arange(6.0))

    def test_rank_guard(self):
        with pytest.raises(ValueError):
            TensorView(jnp.zeros(1), (1,) * 7, (1,) * 7)


class TestErrorFns:
    def test_relative_error(self):
        # (reference: error_functions.nim:10-18)
        assert relative_error(0.0, 0.0) == 0.0
        assert abs(relative_error(1.0, 2.0) - 0.5) < 1e-12
        assert mean_relative_error([1.0, 1.0], [1.0, 1.0]) == 0.0

    def test_rounding(self):
        assert round_step_up(5, 4) == 8
        assert round_step_down(5, 4) == 4
        assert round_step_up(8, 4) == 8


class TestRegistry:
    def test_register_lookup(self):
        from laser_tpu import registry

        @registry.register("dummy_op", dtype="f32")
        def make():
            return 42

        assert registry.lookup("dummy_op", dtype="f32")() == 42
        with pytest.raises(KeyError):
            registry.lookup("dummy_op", dtype="f64")


class TestNegativeStrides:
    def test_reversed_rows(self):
        import jax.numpy as jnp

        a = np.arange(24.0, dtype=np.float32).reshape(4, 6)
        v = TensorView.from_array(jnp.asarray(a)).slice(slice(None, None, -1))
        np.testing.assert_array_equal(np.asarray(v.materialize()), a[::-1])

    def test_reversed_both(self):
        import jax.numpy as jnp

        a = np.arange(24.0, dtype=np.float32).reshape(4, 6)
        v = TensorView.from_array(jnp.asarray(a)).slice(
            slice(None, None, -1), slice(None, None, -2))
        np.testing.assert_array_equal(np.asarray(v.materialize()),
                                      a[::-1, ::-2])
