"""Expert parallelism: a mixture-of-experts layer sharded over an ``ep`` axis.

Parity-plus vs the reference (§2.3: expert parallel — absent). Each device
on the ``ep`` axis owns a contiguous slice of the experts; tokens are
soft-routed (softmax gate) and every device computes only its local experts'
weighted contributions, combined with one psum over ICI. Expert FFNs run the
fused Pallas linear kernels.

This is the dense-dispatch formulation (every expert sees every token,
masked by its gate weight): exact, simple, and the right demo shape for the
framework layer. Capacity-based sparse dispatch (top-k routing with
all_to_all token exchange) is the planned optimization — the communication
pattern (all_to_all over ep) slots into the same shard_map body.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.gemm.autodiff import linear


def init_moe(key: jax.Array, *, n_experts: int, d_model: int, d_ff: int,
             dtype=jnp.float32) -> Dict[str, jax.Array]:
    ks = jax.random.split(key, 3)
    s = jnp.sqrt(1.0 / d_model).astype(dtype)
    return {
        "router": jax.random.normal(ks[0], (d_model, n_experts), dtype) * s,
        "w1": jax.random.normal(ks[1], (n_experts, d_model, d_ff), dtype) * s,
        "w2": jax.random.normal(ks[2], (n_experts, d_ff, d_model), dtype)
        * jnp.sqrt(1.0 / d_ff).astype(dtype),
    }


def moe_forward_dense(params: Dict, x: jax.Array, *, top_k: int = 2
                      ) -> jax.Array:
    """Single-device oracle: softmax-gated top-k mixture over all experts."""
    T, D = x.shape
    E = params["router"].shape[1]
    gates = _topk_gates(x @ params["router"], top_k)
    out = jnp.zeros_like(x)
    for e in range(E):
        h = jnp.maximum(x @ params["w1"][e], 0) @ params["w2"][e]
        out = out + gates[:, e:e + 1] * h
    return out


def _topk_gates(logits: jax.Array, top_k: int) -> jax.Array:
    """Softmax over the top-k logits per token; zeros elsewhere."""
    vals, _ = jax.lax.top_k(logits, top_k)
    thresh = vals[:, -1:]
    masked = jnp.where(logits >= thresh, logits, -jnp.inf)
    return jax.nn.softmax(masked, axis=-1)


def moe_layer(params: Dict, x: jax.Array, mesh: Mesh, *, axis: str = "ep",
              top_k: int = 2) -> jax.Array:
    """Expert-parallel MoE forward: x (T, D) replicated, experts sharded."""
    E = params["router"].shape[1]
    n = mesh.shape[axis]
    if E % n:
        raise ValueError(f"n_experts {E} not divisible by {axis} size {n}")
    e_loc = E // n

    def body(router, w1, w2, x):
        me = jax.lax.axis_index(axis)
        gates = _topk_gates(x @ router, top_k)  # (T, E), router replicated
        out = jnp.zeros_like(x)
        for j in range(e_loc):  # local experts only
            h = linear(x, w1[j], None, "relu")
            h = linear(h, w2[j], None, None)
            g = jax.lax.dynamic_index_in_dim(gates, me * e_loc + j, 1,
                                             keepdims=True)
            out = out + g * h
        return jax.lax.psum(out, axis)

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None, None), P(axis, None, None), P()),
        out_specs=P(), check_vma=False)
    return mapped(params["router"], params["w1"], params["w2"], x)