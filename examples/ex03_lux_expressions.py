"""Lux expression capture + kernel fusion (reference: lux_compiler demos)."""

import numpy as np

from laser_tpu.lux import generate, lux_sigmoid, lux_sin, lux_sum

rng = np.random.RandomState(0)


# Elementwise tree -> ONE fused kernel
@generate
def fused(a, b, c):
    return 2.0 * a + b - lux_sin(c)


x, y, z = (rng.randn(512, 512).astype(np.float32) for _ in range(3))
out = fused(x, y, z)
print("fused expr:", out.shape,
      "err", np.abs(np.asarray(out) - (2 * x + y - np.sin(z))).max())


# Full reduction fuses its elementwise operand into one map-reduce kernel
@generate
def mse(a, b):
    return lux_sum((a - b) * (a - b))


print("fused mse :", float(mse(x, y)),
      "(oracle:", np.sum((x.astype(np.float64) - y) ** 2), ")")


# act(A @ W + b) is recognized and fused into the GEMM epilogue
@generate
def layer(a, w, b):
    return lux_sigmoid(a @ w + b)


w = rng.randn(512, 128).astype(np.float32)
b = rng.randn(128).astype(np.float32)
print("fused layer:", layer(x, w, b).shape,
      "(lowered to one GEMM with sigmoid+bias epilogue)")
print("captured graph root:", layer.lux_graph.kind)
