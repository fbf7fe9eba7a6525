"""The flagship GEMM: fused epilogues, prepacked weights, strided views."""

import jax.numpy as jnp
import numpy as np

import laser_tpu as lt

rng = np.random.RandomState(0)
a = rng.randn(512, 256).astype(np.float32)
w = rng.randn(256, 128).astype(np.float32)
bias = rng.randn(128).astype(np.float32)

# one kernel: C = relu(A @ W + bias)
out = lt.gemm(a, w, bias=jnp.asarray(bias), epilogue="relu")
print("fused linear:", out.shape)

# pack weights once, multiply many times (reference: gemm_prepacked.nim)
from laser_tpu.ops.gemm import plan_tiles

tiles = plan_tiles(512, 128, 256, np.float32)
pw = lt.gemm_prepack_b(jnp.asarray(w), tiles=tiles)
for i in range(3):
    pa = lt.gemm_prepack_a(jnp.asarray(rng.randn(512, 256), jnp.float32),
                           tiles=tiles)
    out = lt.gemm_packed(1.0, pa, pw)
print("prepacked reuse:", out.shape)

# BLAS-style strided call (reference: gemm_strided, gemm.nim:184)
buf = rng.randn(1024, 256).astype(np.float32)   # use every 2nd row
c = lt.gemm_strided(512, 128, 256, 1.0, buf, 512, 1, w, 128, 1, 0.0,
                    None, 128, 1)
print("strided gemm:", c.shape)
