"""All five parallelism axes on a virtual mesh (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu)."""

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.models.mlp import init_mlp, sharded_sgd_step
from laser_tpu.ops.gemm.autodiff import linear
from laser_tpu.parallel import (init_moe, make_mesh, moe_layer,
                                pipeline_forward, ring_attention, shard_array)

key = jax.random.PRNGKey(0)
n = jax.device_count()
print(f"{n} devices")

# dp x tp: megatron-split training step
mesh = make_mesh({"dp": 2, "tp": n // 2}) if n >= 4 else make_mesh({"dp": 1, "tp": n})
D, H, C, B = 64, 128, 8, 32
params = init_mlp(key, [D, H, C])
params[0]["w"] = shard_array(params[0]["w"], mesh, None, "tp")
params[0]["b"] = shard_array(params[0]["b"], mesh, "tp")
params[1]["w"] = shard_array(params[1]["w"], mesh, "tp", None)
params[1]["b"] = shard_array(params[1]["b"], mesh, None)
x = shard_array(jax.random.normal(key, (B, D)), mesh, "dp", None)
y = shard_array(jax.random.randint(key, (B,), 0, C), mesh, "dp")
params, loss = sharded_sgd_step(mesh, [D, H, C])(params, x, y)
print(f"dp x tp training step: loss={float(loss):.4f}")

# pp: GPipe microbatch pipeline
pp_mesh = make_mesh({"pp": n})
ws = jax.random.normal(key, (n, 32, 32)) * 0.3
out = pipeline_forward(lambda p, h: linear(h, p["w"], None, "tanh"),
                       {"w": ws}, jax.random.normal(key, (4, 8, 32)), pp_mesh)
print(f"pp pipeline: out={out.shape}")

# sp: ring attention
sp_mesh = make_mesh({"sp": n})
q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (2, 64 * n, 128)) * 0.3
           for i in range(3))
out = ring_attention(q, k, v, sp_mesh, causal=True, block_q=64, block_k=128)
print(f"sp ring attention: out={out.shape}")

# ep: mixture of experts
ep_mesh = make_mesh({"ep": n})
moe = init_moe(key, n_experts=2 * n, d_model=32, d_ff=64)
out = moe_layer(moe, jax.random.normal(key, (16, 32)), ep_mesh, top_k=2)
print(f"ep MoE: out={out.shape}")
