"""Staged parallel reduction (reference: examples/ex05_tensor_parallel_reduction:
thread-local accumulators + critical-section merge -> here: per-block VMEM
partials + deterministic tree combine)."""

import jax.numpy as jnp
import numpy as np

import laser_tpu as lt

x = np.random.RandomState(0xDEADBEEF).randn(10_000_000).astype(np.float32)

s = lt.reduce_sum(x)
print("reduce_sum :", float(s), " (f64 oracle:", x.sum(dtype=np.float64), ")")
print("reduce_max :", float(lt.reduce_max(x)))

# custom staged map-reduce: dot product in one pass
y = np.random.RandomState(1).randn(10_000_000).astype(np.float32)
dot = lt.for_each_staged(x, y, in_loop=lambda a, b: a * b,
                         after_loop=jnp.sum, identity=0.0)
print("fused dot  :", float(dot), " (oracle:", np.dot(x.astype(np.float64), y), ")")
