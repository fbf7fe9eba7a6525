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

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_backends_agree(self, rng, backend):
        # the measured-dispatch default (XLA basic-index fusion) and the
        # in-kernel Pallas dense-embed strategy must produce identical
        # results on every regular-view pattern
        from laser_tpu.ops.strided import plan_embedding, strided_for_each

        base = rng.randn(8, 32, 256).astype(np.float32)
        cases = [
            self._view(base, (4, 32, 256), (2 * 32 * 256, 256, 1), 0),
            self._view(base, (8, 16, 256), (32 * 256, 2 * 256, 1), 256),
            self._view(base, (8, 32, 256), (-32 * 256, 256, 1),
                       7 * 32 * 256),
        ]
        oracles = [np.asarray(base)[::2], np.asarray(base)[:, 1::2],
                   np.asarray(base)[::-1]]
        for v, want in zip(cases, oracles):
            got = strided_for_each(lambda x: x * 2.0, [v], jnp.float32,
                                   True, backend=backend)
            assert got is not None
            np.testing.assert_allclose(np.asarray(got), want * 2, rtol=1e-6)

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

    def test_welford_mean_var(self, rng):
        # single-pass mean+variance via arbitrary-accumulator staging
        x = rng.randn(123_457).astype(np.float32) * 3 + 5
        m, v = lt.mean_var(x)
        np.testing.assert_allclose(float(m), x.astype(np.float64).mean(),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(v), x.astype(np.float64).var(),
                                   rtol=1e-4)

    def test_argmax_argmin(self, rng):
        x = rng.randn(50_001).astype(np.float32)
        i, v = lt.argmax(x)
        assert int(i) == int(np.argmax(x)) and float(v) == x.max()
        i2, v2 = lt.argmin(x)
        assert int(i2) == int(np.argmin(x)) and float(v2) == x.min()

    def test_argmax_ties_first_occurrence(self):
        x = np.zeros(10_000, np.float32)
        x[137] = 7.0
        x[9000] = 7.0
        i, v = lt.argmax(x)
        assert int(i) == 137 and float(v) == 7.0

    def test_argmax_2d_flat_index(self, rng):
        x = rng.randn(257, 130).astype(np.float32)
        i, v = lt.argmax(x)
        assert int(i) == int(np.argmax(x))

    def test_staged_custom_pytree(self, rng):
        # count of positives + sum of negatives in one pass
        import jax.numpy as jnp
        from laser_tpu.ops.foreach import map_reduce_staged

        x = rng.randn(10_000).astype(np.float32)

        def block_fn(ctx, b):
            pos = b > 0
            neg = b < 0
            if ctx.valid is not None:
                pos = pos & ctx.valid
                neg = neg & ctx.valid
            return {"npos": jnp.sum(pos.astype(jnp.float32)),
                    "sneg": jnp.sum(jnp.where(neg, b, 0.0))}

        def combine(a, b):
            return {"npos": a["npos"] + b["npos"],
                    "sneg": a["sneg"] + b["sneg"]}

        acc = map_reduce_staged(block_fn, x, combine=combine)
        assert int(acc["npos"]) == int((x > 0).sum())
        np.testing.assert_allclose(float(acc["sneg"]), x[x < 0].sum(),
                                   rtol=1e-5)

    def test_determinism(self, rng):
        # Unlike the reference (reductions.nim:58-63), our reduction order is
        # fixed: two runs give bit-identical results.
        x = rng.randn(1_000_00).astype(np.float32)
        a = float(lt.reduce_sum(x))
        b = float(lt.reduce_sum(x))
        assert a == b


class TestXlaFusionBroaderClass:
    """plan_xla_view covers strictly more than the Pallas embedding: lane
    strides > 1, flips on any axis, 1-D strided views — all lowered to one
    fused XLA kernel instead of the gather materialize."""

    def _view(self, base, shape, strides, offset=0):
        return TensorView(jnp.asarray(base).reshape(-1), shape, strides, offset)

    def test_lane_strided_in_class(self, rng):
        from laser_tpu.ops.strided import plan_embedding, plan_xla_view

        base = rng.randn(64, 256).astype(np.float32)
        v = self._view(base, (64, 128), (256, 2), 0)     # every-2nd-col
        assert plan_embedding(v) is None                 # Pallas can't
        assert plan_xla_view(v) is not None              # XLA can
        out = lt.for_each(lambda x: x * 3.0, v)
        np.testing.assert_allclose(np.asarray(out), base[:, ::2] * 3,
                                   rtol=1e-6)

    def test_lane_strided_with_phase(self, rng):
        base = rng.randn(64, 256).astype(np.float32)
        v = self._view(base, (64, 64), (256, 4), 1)      # cols 1::4
        out = lt.for_each(lambda x: x + 1.0, v)
        np.testing.assert_allclose(np.asarray(out), base[:, 1::4] + 1,
                                   rtol=1e-6)

    def test_flipped_row_axis(self, rng):
        from laser_tpu.ops.strided import plan_xla_view

        base = rng.randn(32, 128).astype(np.float32)
        v = self._view(base, (32, 128), (-128, 1), 31 * 128)  # rows reversed
        assert plan_xla_view(v) is not None
        out = lt.for_each(lambda x: x * 2.0, v)
        np.testing.assert_allclose(np.asarray(out), base[::-1] * 2, rtol=1e-6)

    def test_one_dim_strided(self, rng):
        base = rng.randn(1024).astype(np.float32)
        v = self._view(base, (256,), (4,), 2)            # base[2::4]
        out = lt.for_each(lambda x: x - 1.0, v)
        np.testing.assert_allclose(np.asarray(out), base[2::4] - 1, rtol=1e-6)

    def test_flip_and_lane_stride_combined(self, rng):
        base = rng.randn(16, 8, 64).astype(np.float32)
        # planes reversed, every-2nd column
        v = self._view(base, (16, 8, 32), (-8 * 64, 64, 2), 15 * 8 * 64)
        out = lt.for_each(lambda x: x * 5.0, v)
        np.testing.assert_allclose(np.asarray(out), base[::-1, :, ::2] * 5,
                                   rtol=1e-6)

    def test_transposed_still_out_of_class(self, rng):
        from laser_tpu.ops.strided import plan_xla_view

        base = rng.randn(32, 64).astype(np.float32)
        assert plan_xla_view(self._view(base, (64, 32), (1, 64))) is None
        # but for_each is still correct via the materialize fallback
        out = lt.for_each(lambda x: x * 2.0,
                          self._view(base, (64, 32), (1, 64)))
        np.testing.assert_allclose(np.asarray(out), base.T * 2, rtol=1e-6)
