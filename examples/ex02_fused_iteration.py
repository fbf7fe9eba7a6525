"""Fused multi-tensor iteration — ONE kernel for o = x + y - sin(z)
(reference: the forEach demo, strided_iteration/README.md:91-97)."""

import jax.numpy as jnp
import numpy as np

import laser_tpu as lt

rng = np.random.RandomState(0)
x, y, z = (rng.randn(1000, 1000).astype(np.float32) for _ in range(3))

out = lt.for_each(lambda a, b, c: a + b - jnp.sin(c), x, y, z)
print("max err vs numpy:", np.abs(np.asarray(out) - (x + y - np.sin(z))).max())

# strided views fuse too (every 2nd row)
from laser_tpu import TensorView

va = TensorView.from_array(jnp.asarray(x)).slice(slice(0, 1000, 2))
out2 = lt.for_each(lambda a, b: a * b, va, y[:500])
print("strided result:", out2.shape)
