"""Fused-iteration tests (forEach / forEachStaged coverage, SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt
from laser_tpu.tensor import TensorView


class TestForEach:
    @pytest.mark.parametrize("shape", [(128,), (1000,), (37,), (64, 129), (3, 5, 7)])
    def test_fused_expr(self, rng, shape):
        # o = x + y - sin z : the reference's flagship fusion demo
        # (iter_bench_prod.nim:25-45)
        x = rng.randn(*shape).astype(np.float32)
        y = rng.randn(*shape).astype(np.float32)
        z = rng.randn(*shape).astype(np.float32)
        out = lt.for_each(lambda a, b, c: a + b - jnp.sin(c), x, y, z)
        np.testing.assert_allclose(np.asarray(out), x + y - np.sin(z),
                                   rtol=1e-6, atol=1e-6)

    def test_strided_operand(self, rng):
        # strided branch: every-2nd-row view mixed with contiguous operands
        a = rng.randn(16, 12).astype(np.float32)
        b = rng.randn(8, 12).astype(np.float32)
        va = TensorView.from_array(jnp.asarray(a)).slice(slice(0, 16, 2))
        out = lt.for_each(lambda x, y: x * y, va, b)
        np.testing.assert_allclose(np.asarray(out), a[::2] * b, rtol=1e-6)

    def test_dtype_promotion(self, rng):
        x = rng.randint(0, 10, (50,)).astype(np.int32)
        out = lt.for_each(lambda a: a * 2, x)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out), x * 2)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            lt.for_each(lambda a, b: a + b, np.zeros(3), np.zeros(4))


class TestStridedInKernel:
    """In-kernel strided iteration (ops/strided.py): regular views must plan
    an embedding (single-pass kernel, no materialize) AND be correct; views
    outside the class must still be correct via the fallback."""

    def _view(self, base, shape, strides, offset=0):
        return TensorView(jnp.asarray(base).reshape(-1), shape, strides, offset)

    def test_plans_embedding_for_regular_views(self, rng):
        from laser_tpu.ops.strided import plan_embedding

        base = rng.randn(64, 256).astype(np.float32)
        M, C = base.shape
        # every-2nd-row, offset row windows, rank-3 skips all embed
        assert plan_embedding(self._view(base, (32, C), (2 * C, 1))) is not None
        assert plan_embedding(self._view(base, (32, C), (2 * C, 1), C)) is not None
        assert plan_embedding(self._view(base, (16, C), (4 * C, 1), 2 * C)) is not None
        # lane-strided and transposed views do not (fallback class)
        assert plan_embedding(self._view(base, (M, C // 2), (C, 2))) is None
        assert plan_embedding(self._view(base, (C, M), (1, C))) is None

    @pytest.mark.parametrize("step,off", [(2, 0), (2, 1), (4, 2)])
    def test_row_subsampling(self, rng, step, off):
        base = rng.randn(64, 256).astype(np.float32)
        C = base.shape[1]
        v = self._view(base, (64 // step, C), (step * C, 1), off * C)
        out = lt.for_each(lambda x: x * 2.0, v)
        np.testing.assert_allclose(np.asarray(out), base[off::step] * 2,
                                   rtol=1e-6)

    def test_leading_axis_flip(self, rng):
        base = rng.randn(4, 32, 128).astype(np.float32)
        v = self._view(base, (4, 32, 128), (-32 * 128, 128, 1), 3 * 32 * 128)
        out = lt.for_each(lambda x: x + 1.0, v)
        np.testing.assert_allclose(np.asarray(out), base[::-1] + 1, rtol=1e-6)

    def test_flip_plus_mid_skip(self, rng):
        base = rng.randn(4, 32, 128).astype(np.float32)
        v = self._view(base, (4, 16, 128), (-32 * 128, 2 * 128, 1),
                       3 * 32 * 128)
        out = lt.for_each(lambda x: x * 3.0, v)
        np.testing.assert_allclose(np.asarray(out), base[::-1, 0::2] * 3,
                                   rtol=1e-6)

    def test_mixed_strided_and_contiguous(self, rng):
        base = rng.randn(64, 256).astype(np.float32)
        b = rng.randn(32, 256).astype(np.float32)
        v = self._view(base, (32, 256), (512, 1), 0)
        out = lt.for_each(lambda x, y: x + jnp.sin(y), v, b)
        np.testing.assert_allclose(np.asarray(out), base[::2] + np.sin(b),
                                   rtol=1e-6, atol=1e-6)

    def test_unsupported_views_fall_back_correctly(self, rng):
        base = rng.randn(64, 256).astype(np.float32)
        # every-2nd-column (lane stride 2): materialize fallback
        v = self._view(base, (64, 128), (256, 2), 0)
        out = lt.for_each(lambda x: x * 3.0, v)
        np.testing.assert_allclose(np.asarray(out), base[:, ::2] * 3, rtol=1e-6)


class TestMapReduce:
    def test_sum_of_squares(self, rng):
        x = rng.randn(100_000).astype(np.float32)
        out = lt.map_reduce(lambda a: a * a, x)
        assert abs(float(out) - np.sum(x.astype(np.float64) ** 2)) / abs(
            np.sum(x.astype(np.float64) ** 2)) < 1e-5

    def test_dot_product_staged(self, rng):
        # the ex05 parallel-reduction pattern (examples/ex05:15-59)
        x = rng.randn(4096).astype(np.float32)
        y = rng.randn(4096).astype(np.float32)
        out = lt.for_each_staged(x, y, in_loop=lambda a, b: a * b,
                                 after_loop=jnp.sum, identity=0.0)
        np.testing.assert_allclose(float(out),
                                   np.dot(x.astype(np.float64), y), rtol=1e-5)

    def test_max_reduce_nonaligned(self, rng):
        x = rng.randn(12345).astype(np.float32)
        out = lt.map_reduce(lambda a: a, x, reduce_fn=jnp.max, identity=-np.inf)
        assert float(out) == x.max()

    def test_determinism(self, rng):
        # Unlike the reference (reductions.nim:58-63), our reduction order is
        # fixed: two runs give bit-identical results.
        x = rng.randn(1_000_00).astype(np.float32)
        a = float(lt.reduce_sum(x))
        b = float(lt.reduce_sum(x))
        assert a == b
