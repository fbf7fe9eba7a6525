"""Multi-chip GEMM over a device mesh (parity-plus vs the reference's
single-node OpenMP; run under XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu to simulate 8 chips)."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.parallel import gemm_sharded, make_mesh

mesh = make_mesh()  # all devices on one "dp" axis
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

rng = np.random.RandomState(0)
a = jnp.asarray(rng.randn(1024, 512), jnp.float32)
b = jnp.asarray(rng.randn(512, 256), jnp.float32)

for strategy in ("row", "col", "k"):
    c = gemm_sharded(a, b, mesh, strategy=strategy)
    err = np.abs(np.asarray(c) - np.asarray(a, np.float64) @ np.asarray(b)).max()
    print(f"strategy={strategy:4s} -> {c.shape}, max err {err:.2e}")
