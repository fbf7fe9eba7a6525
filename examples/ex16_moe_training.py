"""Mixture-of-experts LM: routed training, then expert-parallel scaling.

The fourth model family (models/moe.py): flash-attention blocks with a
top-k routed expert FFN and the Switch load-balancing auxiliary loss. The
expert-parallel step shards every block's experts over an ``ep`` mesh axis
and reproduces the single-device step EXACTLY (its expert mixture is a
custom-VJP boundary that psums both the forward combine and the replicated
cotangents — no collective is ever differentiated).

Run on any host: uses however many devices exist (set
XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu for a
virtual mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.models.moe import (init_moe_transformer, moe_lm_loss,
                                  moe_train_step, moe_train_step_ep)
from laser_tpu.parallel import make_mesh

key = jax.random.PRNGKey(0)
n_dev = jax.device_count()
params = init_moe_transformer(key, n_layers=2, d_model=64, n_heads=4,
                              d_ff=128, vocab=256, n_experts=2 * n_dev)
tokens = jax.random.randint(jax.random.fold_in(key, 1), (4, 32), 0, 256)

# -- single-device routed training --------------------------------------
step = jax.jit(lambda p, t: moe_train_step(p, t, n_heads=4, lr=5e-2))
p = params
print(f"initial loss: {float(moe_lm_loss(p, tokens, n_heads=4)):.4f}")
for i in range(5):
    p, loss = step(p, tokens)
print(f"after 5 steps: {float(loss):.4f}")

# -- expert-parallel: same step, experts sharded over ep -----------------
if n_dev >= 2:
    mesh = make_mesh({"ep": n_dev})
    new_ep, loss_ep = moe_train_step_ep(params, tokens, mesh, n_heads=4,
                                        lr=5e-2)
    new_ref, loss_ref = moe_train_step(params, tokens, n_heads=4, lr=5e-2)
    print(f"ep={n_dev} loss {float(loss_ep):.6f} == "
          f"single-device {float(loss_ref):.6f}")
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(new_ref),
        jax.tree_util.tree_leaves(new_ep)))
    print(f"max param delta vs oracle after one step: {worst:.2e}")
else:
    print("one device: skipping the expert-parallel comparison")
