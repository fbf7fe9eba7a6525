"""Native host library tests (csrc/laser_host.cpp via laser_tpu.host)."""

import numpy as np
import pytest

host = pytest.importorskip("laser_tpu.host")

if not host.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


class TestFenwick:
    def test_total_and_get(self):
        s = host.FenwickSampler([1.0, 2.0, 3.0, 4.0])
        assert abs(s.total - 10.0) < 1e-9
        assert s[2] == 3.0

    def test_update(self):
        s = host.FenwickSampler([1.0, 2.0, 3.0])
        s.update(1, 5.0)
        assert abs(s.total - 9.0) < 1e-9
        assert s[1] == 5.0

    def test_sample_distribution(self):
        w = np.asarray([1, 2, 3, 4], np.float32)
        s = host.FenwickSampler(w)
        out = s.sample(40_000, seed=0xDEADBEEF)
        freq = np.bincount(out, minlength=4) / 40_000
        np.testing.assert_allclose(freq, w / w.sum(), atol=0.02)

    def test_sample_deterministic(self):
        s = host.FenwickSampler(np.random.RandomState(0).rand(1000).astype(np.float32))
        a = s.sample(100, seed=7)
        b = s.sample(100, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_zero_weight_never_sampled(self):
        s = host.FenwickSampler([0.0, 1.0, 0.0, 1.0])
        out = s.sample(5000, seed=3)
        assert set(np.unique(out)) <= {1, 3}

    def test_without_replacement_unique_and_restores(self):
        w = np.random.RandomState(1).rand(500).astype(np.float32)
        s = host.FenwickSampler(w)
        t0 = s.total
        out = s.sample(50, seed=11, replacement=False)
        assert len(set(out.tolist())) == 50
        assert abs(s.total - t0) < 1e-6  # weights restored

    def test_without_replacement_exhaustive(self):
        s = host.FenwickSampler([1.0, 1.0, 1.0, 1.0])
        out = s.sample(4, seed=5, replacement=False)
        assert sorted(out.tolist()) == [0, 1, 2, 3]

    def test_heavy_weight_always_drawn(self):
        w = np.full(100, 1e-4, np.float32)
        w[42] = 1e4
        s = host.FenwickSampler(w)
        for seed in range(20):
            assert 42 in s.sample(3, seed=seed, replacement=False)

    def test_one_shot_multinomial(self):
        out = host.multinomial([1.0, 1.0], 1000, seed=1)
        assert set(np.unique(out)) <= {0, 1}

    def test_large_vocab(self):
        # the reference's benchmark config: vocab 50k
        w = np.random.RandomState(2).rand(50_000).astype(np.float32)
        s = host.FenwickSampler(w)
        out = s.sample(10_000, seed=1)
        assert out.min() >= 0 and out.max() < 50_000


class TestStridedCopy:
    def test_transpose_2d(self):
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        got = host.strided_copy(a, (6, 4), (1, 6))
        np.testing.assert_array_equal(got, a.T)

    def test_every_second_row(self):
        a = np.arange(40, dtype=np.float32).reshape(8, 5)
        got = host.strided_copy(a, (4, 5), (10, 1))
        np.testing.assert_array_equal(got, a[::2])

    def test_rank3_f64(self):
        a = np.arange(60, dtype=np.float64).reshape(3, 4, 5)
        got = host.strided_copy(a, (5, 4, 3), (1, 5, 20))
        np.testing.assert_array_equal(got, a.transpose(2, 1, 0))

    def test_offset(self):
        a = np.arange(20, dtype=np.float32)
        got = host.strided_copy(a, (3,), (2,), offset=4)
        np.testing.assert_array_equal(got, a[4:10:2])


class TestHostJit:
    """Runtime-GENERATED host code: specialized C++ from a declarative spec
    (the photon_jit analog, host/jit.py). Oracles are NumPy as_strided."""

    def _view(self, flat, shape, strides, offset=0):
        return np.lib.stride_tricks.as_strided(
            flat[offset:], shape,
            [s * flat.itemsize for s in strides])

    def test_copy_transpose(self):
        from laser_tpu.host.jit import host_kernel

        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        k = host_kernel("copy", np.float32, (6, 4), [(1, 6)])
        np.testing.assert_array_equal(k(a), a.T)

    def test_axpy_strided(self):
        from laser_tpu.host.jit import host_kernel

        rng = np.random.RandomState(0)
        x = rng.randn(8, 10).astype(np.float32)
        y = rng.randn(4, 5).astype(np.float32)
        # x view: every 2nd row, every 2nd col
        k = host_kernel("axpy", np.float32, (4, 5), [(20, 2), (5, 1)])
        got = k(x, y, alpha=2.5)
        np.testing.assert_allclose(got, 2.5 * x[::2, ::2] + y, rtol=1e-6)

    def test_negative_stride_reversal(self):
        from laser_tpu.host.jit import host_kernel

        a = np.arange(12, dtype=np.float64)
        k = host_kernel("copy", np.float64, (12,), [(-1,)], offsets=[11])
        np.testing.assert_array_equal(k(a), a[::-1])

    def test_rank3_fma(self):
        from laser_tpu.host.jit import host_kernel

        rng = np.random.RandomState(1)
        a = rng.randn(2, 3, 4).astype(np.float32)
        b = rng.randn(2, 3, 4).astype(np.float32)
        c = rng.randn(2, 3, 4).astype(np.float32)
        st = (12, 4, 1)
        k = host_kernel("fma", np.float32, (2, 3, 4), [st, st, st])
        np.testing.assert_allclose(k(a, b, c), a * b + c, rtol=1e-6)

    def test_int64_exact(self):
        from laser_tpu.host.jit import host_kernel

        a = np.arange(10, dtype=np.int64) * (1 << 40)
        b = np.ones(10, dtype=np.int64)
        k = host_kernel("add", np.int64, (10,), [(1,), (1,)])
        np.testing.assert_array_equal(k(a, b), a + b)

    def test_exp_matches_libm(self):
        from laser_tpu.host.jit import host_kernel

        x = np.linspace(-3, 3, 64).astype(np.float64)
        k = host_kernel("exp", np.float64, (64,), [(1,)])
        np.testing.assert_allclose(k(x), np.exp(x), rtol=1e-15)

    def test_cache_identity_and_source(self):
        from laser_tpu.host.jit import host_kernel

        k1 = host_kernel("mul", np.float32, (3, 3), [(3, 1), (3, 1)])
        k2 = host_kernel("mul", np.float32, (3, 3), [(3, 1), (3, 1)])
        assert k1 is k2                      # spec-keyed cache
        assert "3L" in k1.source             # bounds folded as literals
        k3 = host_kernel("mul", np.float32, (4, 3), [(3, 1), (3, 1)])
        assert k3 is not k1                  # new spec -> new code

    def test_spec_validation(self):
        from laser_tpu.host.jit import host_kernel

        with pytest.raises(ValueError, match="unknown host op"):
            host_kernel("bogus", np.float32, (4,), [(1,)])
        with pytest.raises(ValueError, match="takes 2 inputs"):
            host_kernel("add", np.float32, (4,), [(1,)])
        with pytest.raises(TypeError, match="unsupported dtype"):
            host_kernel("add", np.float16, (4,), [(1,), (1,)])
        k = host_kernel("copy", np.float32, (100,), [(7,)])
        with pytest.raises(ValueError, match="required"):
            k(np.zeros(50, np.float32))  # buffer too small for the view

    def test_strided_copy_specialized_path(self):
        # strided_copy(specialize=True) == generic native path, via the
        # generated-code kernel
        a = np.arange(60, dtype=np.float64).reshape(3, 4, 5)
        want = host.strided_copy(a, (5, 4, 3), (1, 5, 20))
        got = host.strided_copy(a, (5, 4, 3), (1, 5, 20), specialize=True)
        np.testing.assert_array_equal(got, want)
