"""Quantization kernel tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.quant import dequantize_int8, gemm_quantized, quantize_int8


class TestQuantize:
    def test_roundtrip_per_row(self, rng):
        x = rng.randn(32, 256).astype(np.float32) * 5
        q, s = quantize_int8(x)
        assert q.dtype == jnp.int8 and s.shape == (32, 1)
        back = np.asarray(dequantize_int8(q, s))
        # max error = half a quantization step per row
        step = np.abs(x).max(-1, keepdims=True) / 127
        assert (np.abs(back - x) <= 0.5 * step + 1e-6).all()

    def test_global_scale(self, rng):
        x = rng.randn(64, 128).astype(np.float32)
        q, s = quantize_int8(x, per_row=False)
        back = np.asarray(dequantize_int8(q, s))
        step = np.abs(x).max() / 127
        assert (np.abs(back - x) <= 0.5 * step + 1e-6).all()

    def test_unaligned_shape(self, rng):
        x = rng.randn(10, 100).astype(np.float32)
        q, s = quantize_int8(x)
        assert q.shape == (10, 100) and s.shape == (10, 1)
        back = np.asarray(dequantize_int8(q, s))
        step = np.abs(x).max(-1, keepdims=True) / 127
        assert (np.abs(back - x) <= 0.5 * step + 1e-6).all()

    def test_range_used(self, rng):
        x = rng.randn(8, 128).astype(np.float32)
        q, _ = quantize_int8(x)
        assert np.abs(np.asarray(q)).max() == 127  # scale hits the max


class TestQuantizedGemm:
    def test_vs_f32(self, rng):
        M, N, K = 64, 48, 128
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        got = np.asarray(gemm_quantized(a, b))
        want = a.astype(np.float64) @ b.astype(np.float64)
        # int8 error bound: relative to row/col norms, ~1% for gaussian data
        denom = np.abs(want) + np.abs(a).max() * np.abs(b).max() * K * 0.01
        assert (np.abs(got - want) / denom).max() < 0.05
