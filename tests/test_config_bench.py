"""Config system, bench harness internals, and profiling helper tests."""

import logging

import numpy as np
import pytest

import laser_tpu as lt
from laser_tpu.bench.harness import BenchResult, RunningStat
from laser_tpu.config import config_override, get_config, set_config


class TestConfig:
    def test_override_restores(self):
        base = get_config().elementwise_grain
        with config_override(elementwise_grain=123456):
            assert get_config().elementwise_grain == 123456
        assert get_config().elementwise_grain == base

    def test_unknown_field_raises(self):
        with pytest.raises(AttributeError):
            set_config(nonexistent_knob=1)

    def test_vector_math_algorithm_knob(self, rng):
        x = rng.randn(1000).astype(np.float32)
        with config_override(vector_math_algorithm="fast"):
            fast = np.asarray(lt.exp(x))
        acc = np.asarray(lt.exp(x))
        # both valid exps; interpret-mode 'fast' (jnp.exp) vs poly differ at ulp level
        np.testing.assert_allclose(fast, acc, rtol=1e-5)

    def test_bad_algorithm_raises(self, rng):
        with pytest.raises(ValueError, match="algorithm"):
            lt.exp(np.zeros(8, np.float32), algorithm="warp-speed")


class TestRunningStat:
    def test_moments(self):
        rs = RunningStat()
        data = [1.0, 2.0, 3.0, 4.0]
        for d in data:
            rs.push(d)
        assert rs.n == 4
        np.testing.assert_allclose(rs.mean, 2.5)
        np.testing.assert_allclose(rs.std, np.std(data))
        assert rs.min == 1.0 and rs.max == 4.0

    def test_bench_result_rates(self):
        r = BenchResult("x", 2.0, 1.0, 3.0, 0.5, 10, flops=2_000_000,
                        bytes_moved=1_000_000)
        assert r.gflops == 2_000_000 / 1e6  # min time 1 ms
        assert r.gbps == 1.0
        d = r.as_dict()
        assert d["gflops"] == 2.0


class TestProfiling:
    def test_build_cache_logs_misses(self, caplog):
        from laser_tpu.registry import build_cache

        calls = []

        @build_cache
        def make_thing(n):
            calls.append(n)
            return n * 2

        with caplog.at_level(logging.DEBUG, logger="laser_tpu"):
            assert make_thing(3) == 6
            assert make_thing(3) == 6  # cache hit: no rebuild
        assert calls == [3]
        assert make_thing.cache_info().hits >= 1

    def test_memory_stats_shape(self):
        from laser_tpu.bench.profiling import device_memory_stats

        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestTopLevelExports:
    def test_surface(self):
        for name in ("gemm", "gemm_strided", "gemm_batched", "gemm_packed",
                     "for_each", "map_reduce", "reduce_sum", "exp", "log",
                     "tanh", "sigmoid", "softmax", "layer_norm", "rms_norm",
                     "attention", "transpose2d", "nchw2nhwc", "conv2d_direct",
                     "conv2d_im2col", "stencil_solve", "sample_multinomial",
                     "quantize_int8", "gemm_quantized", "TensorView",
                     "detect", "min_tile"):
            assert hasattr(lt, name), name
