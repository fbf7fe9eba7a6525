"""int8 quantization + quantized GEMM on the MXU's 394 TOP/s int8 path."""

import numpy as np

from laser_tpu.ops.quant import dequantize_int8, gemm_quantized, quantize_int8

rng = np.random.RandomState(0)
x = rng.randn(64, 256).astype(np.float32) * 3

q, scales = quantize_int8(x)  # per-row scales
back = np.asarray(dequantize_int8(q, scales))
print("quantize roundtrip max err:", np.abs(back - x).max(),
      "(half-step bound:", float(np.abs(x).max(-1).max() / 254), ")")

# stochastic rounding (TPU hardware PRNG; unbiased for training)
q_s, s_s = quantize_int8(x, stochastic=True, seed=42)
print("stochastic mean err:",
      float((np.asarray(q_s, np.float32) * np.asarray(s_s) - x).mean()))

# full f32 -> int8 MXU -> f32 GEMM
a = rng.randn(512, 1024).astype(np.float32)
b = rng.randn(1024, 512).astype(np.float32)
got = np.asarray(gemm_quantized(a, b))
want = a.astype(np.float64) @ b
print("quantized GEMM rel err:",
      float(np.abs(got - want).max() / np.abs(want).max()))
