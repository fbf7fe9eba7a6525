"""Blockwise (flash) attention: O(S) memory, matches the XLA reference."""

import numpy as np
import jax.numpy as jnp

from laser_tpu.ops.attention import attention, attention_reference

rng = np.random.RandomState(0)
B, S, D = 2, 1024, 128
q = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.float32)
k = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.float32)
v = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.float32)

out = attention(q, k, v, causal=True)
ref = attention_reference(q, k, v, causal=True)
print("causal attention:", out.shape,
      "max err vs reference:", float(np.abs(np.asarray(out) - np.asarray(ref)).max()))

out = attention(q, k, v)  # bidirectional
print("full attention  :", out.shape)
