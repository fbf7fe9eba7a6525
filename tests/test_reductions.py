"""Reduction tests — port of tests/test_x86_reductions.nim:13-33 (property
style vs a lifted oracle, 1e-5 rel+abs error bars) plus accuracy/dtype cases."""

import numpy as np
import pytest

import laser_tpu as lt
from laser_tpu.utils import absolute_error, relative_error


class TestReduceProperty:
    @pytest.mark.parametrize("n", [1, 17, 1000, 100_000])
    def test_sum_vs_oracle(self, rng, n):
        x = (rng.rand(n).astype(np.float32) - 0.5) * 100
        got = float(lt.reduce_sum(x))
        want = float(np.sum(x.astype(np.float64)))
        assert relative_error(got, want) < 1e-5 or absolute_error(got, want) < 1e-5

    @pytest.mark.parametrize("n", [1, 17, 1000, 100_000])
    def test_min_max_exact(self, rng, n):
        x = (rng.rand(n).astype(np.float32) - 0.5) * 100
        assert float(lt.reduce_min(x)) == x.min()
        assert float(lt.reduce_max(x)) == x.max()

    def test_sum_accuracy_beats_naive(self, rng):
        # pairwise-tree accuracy requirement (SURVEY C21): error vs f64 oracle
        # must be at most that of a naive sequential f32 sum.
        x = (rng.rand(1_000_000).astype(np.float32)) + 1.0
        oracle = np.sum(x.astype(np.float64))
        naive = np.float32(0)
        for chunk in np.split(x, 100):  # emulate naive accumulation cheaply
            naive += chunk.sum(dtype=np.float32)
        got = float(lt.reduce_sum(x))
        assert relative_error(got, oracle) <= relative_error(float(naive), oracle) + 1e-9

    def test_int_sum(self, rng):
        x = rng.randint(-1000, 1000, 10_000).astype(np.int32)
        assert int(lt.reduce_sum(x)) == int(x.sum())

    def test_mean(self, rng):
        x = rng.randn(10_000).astype(np.float32)
        np.testing.assert_allclose(float(lt.reduce_mean(x)), x.mean(), rtol=1e-5)
