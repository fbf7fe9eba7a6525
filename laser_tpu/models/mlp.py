"""Flagship demo model: an MLP classifier built entirely on laser-tpu kernels.

The reference has no model layer (it's a primitives zoo intended to power
Arraymancer, README.md:296-298); this module plays the role of the
reference's examples/ directory — a complete, trainable consumer of the
library that exercises the fused linear kernels (forward), the custom-VJP
GEMMs (backward), and the sharded GEMM layer (multi-chip training step).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.gemm import gemm
from ..ops.gemm.autodiff import linear
from ..ops.vector_math import softmax

Params = Dict[str, jax.Array]


def init_mlp(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> List[Params]:
    """dims = [in, hidden..., out]; He-ish init."""
    params = []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, k = jax.random.split(key)
        params.append({
            "w": (jax.random.normal(k, (d_in, d_out), dtype)
                  * jnp.sqrt(2.0 / d_in).astype(dtype)),
            "b": jnp.zeros((d_out,), dtype),
        })
    return params


def mlp_forward(params: List[Params], x: jax.Array,
                activation: str = "relu") -> jax.Array:
    """Logits. Every layer is ONE fused Pallas kernel (GEMM+bias+act)."""
    h = x
    for i, layer in enumerate(params):
        act = activation if i < len(params) - 1 else None
        h = linear(h, layer["w"], layer["b"], act)
    return h


def mlp_predict(params: List[Params], x: jax.Array) -> jax.Array:
    """Class probabilities via the fused softmax kernel."""
    return softmax(mlp_forward(params, x))


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def loss_fn(params: List[Params], x: jax.Array, y: jax.Array) -> jax.Array:
    return cross_entropy(mlp_forward(params, x), y)


def sgd_step(params: List[Params], x: jax.Array, y: jax.Array,
             lr: float = 1e-2):
    """One training step: loss + grads (through the Pallas custom VJPs) +
    SGD update. jit-able as-is."""
    loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


# ---------------------------------------------------------------------------
# Multi-chip training step: dp (batch) x tp (hidden) sharding via shard_map.
# Forward/backward run the local Pallas kernels; ICI collectives stitch the
# tensor-parallel contraction (psum) and the data-parallel grads (pmean).
# ---------------------------------------------------------------------------

def sharded_sgd_step(mesh: Mesh, dims: Sequence[int], lr: float = 1e-2,
                     activation: str = "relu"):
    """Build a jitted (params, x, y) -> (params, loss) step over ``mesh``
    with axes ("dp", "tp").

    Layout (2-layer case, the megatron pattern):
      W0: (D, H) sharded on tp along H (column parallel)  -> h local
      W1: (H, C) sharded on tp along H (row parallel)     -> psum(tp)
      batch sharded on dp; grads pmean'd over dp.
    """
    if len(dims) != 3:
        raise ValueError("sharded MLP demo is the canonical 2-layer megatron "
                         f"split; got dims={dims}")
    if activation != "relu":
        raise NotImplementedError("manual backward implements relu")

    def step(w0, b0, w1, b1, x, y):
        """Explicit forward + backward: the backward is hand-derived (two
        Pallas GEMMs per layer, like ops/gemm/autodiff.py) so no collective
        is ever differentiated — sidestepping the psum-transpose scaling
        pitfall of grad-through-shard_map, and matching how the reference
        would have written it (no autodiff in Nim either)."""
        Blocal = x.shape[0]
        C = b1.shape[0]
        # ---- forward (local Pallas kernels + one TP psum) ----
        z0 = gemm(x, w0, bias=b0)               # (B/dp, H/tp) pre-activation
        h = jnp.maximum(z0, 0)
        part = gemm(h, w1)                      # partial over H/tp shard
        logits = jax.lax.psum(part, "tp") + b1  # TP contraction over ICI
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(y, C, dtype=logits.dtype)
        loss = -jnp.mean(jnp.sum(logp * onehot, axis=-1))
        # ---- backward (hand-derived, local GEMMs) ----
        dlogits = (jnp.exp(logp) - onehot) / Blocal  # replicated over tp
        g_b1 = jnp.sum(dlogits, axis=0)
        g_w1 = gemm(h.T, dlogits)               # (H/tp, C) local shard grad
        dh = gemm(dlogits, w1.T)                # (B/dp, H/tp) local
        dz0 = dh * (z0 > 0).astype(dh.dtype)
        g_w0 = gemm(x.T, dz0)                   # (D, H/tp)
        g_b0 = jnp.sum(dz0, axis=0)
        # ---- data-parallel reductions over ICI ----
        g_w0, g_b0, g_w1, g_b1 = (jax.lax.pmean(g, "dp")
                                  for g in (g_w0, g_b0, g_w1, g_b1))
        loss = jax.lax.pmean(loss, "dp")
        return (w0 - lr * g_w0, b0 - lr * g_b0, w1 - lr * g_w1,
                b1 - lr * g_b1, loss)

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P("tp", None), P(None),
                  P("dp", None), P("dp")),
        out_specs=(P(None, "tp"), P("tp"), P("tp", None), P(None), P()),
        check_vma=False,  # Pallas calls don't carry vma metadata yet
    )

    @jax.jit
    def jitted(params, x, y):
        w0, b0, w1, b1, loss = mapped(params[0]["w"], params[0]["b"],
                                      params[1]["w"], params[1]["b"], x, y)
        return [{"w": w0, "b": b0}, {"w": w1, "b": b1}], loss

    return jitted
