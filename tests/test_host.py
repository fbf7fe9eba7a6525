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
