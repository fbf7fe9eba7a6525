"""Pipeline parallelism: GPipe-style SPMD microbatch pipeline over a mesh axis.

Parity-plus vs the reference (§2.3: pipeline parallel — absent). Each device
on the ``pp`` axis owns one stage's parameters; microbatches enter at stage
0, hop stage-to-stage over ICI via ``jax.lax.ppermute``, and drain from the
last stage. Local stage compute runs the caller's function (typically the
fused Pallas linear), so the pipeline is a pure communication schedule on
top of the existing kernels.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def spmd_pipeline(stage_fn: Callable, axis: str = "pp"):
    """Build the per-device pipeline body for use inside shard_map.

    stage_fn(stage_params, x) -> y applies THIS device's stage. Returns
    body(stage_params, microbatches) where microbatches is (n_micro, mb, ...)
    (replicated; only stage 0 reads it). Output is the last stage's results,
    broadcast to every stage (psum-masked), shape (n_micro, mb, ...).
    """

    def body(stage_params, micro):
        stage = jax.lax.axis_index(axis)
        S = jax.lax.axis_size(axis)
        n_micro = micro.shape[0]
        T = n_micro + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def step(t, carry):
            buf, outs = carry
            inject = jnp.clip(t, 0, n_micro - 1)
            x_in = jnp.where(stage == 0,
                             jax.lax.dynamic_index_in_dim(micro, inject, 0,
                                                          keepdims=False),
                             buf)
            y = stage_fn(stage_params, x_in)
            out_t = t - (S - 1)
            record = jnp.logical_and(stage == S - 1,
                                     jnp.logical_and(out_t >= 0,
                                                     out_t < n_micro))
            idx = jnp.clip(out_t, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(record, y, cur), idx, 0)
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs)

        buf0 = jnp.zeros(micro.shape[1:], micro.dtype)
        outs0 = jnp.zeros_like(micro)
        _, outs = jax.lax.fori_loop(0, T, step, (buf0, outs0))
        # broadcast the last stage's outputs to every device on the axis.
        # psum_fwd_copy_bwd (not raw psum): differentiating THROUGH the
        # pipeline (llama_train_step_pp) must send each device exactly its
        # own outs cotangent — the local mask then zeroes every stage but
        # the last, which is the correct adjoint of this broadcast.
        from .mesh import psum_fwd_copy_bwd

        mask = (stage == S - 1).astype(outs.dtype)
        return psum_fwd_copy_bwd(axis)(outs * mask)

    return body


def pipeline_forward(stage_fn: Callable, stage_params, microbatches,
                     mesh: Mesh, *, axis: str = "pp") -> jax.Array:
    """Run the pipeline over ``mesh``: stage_params sharded along ``axis``
    (one stage per device, leading axis = stage), microbatches replicated."""
    body = spmd_pipeline(stage_fn, axis)
    in_specs = (jax.tree_util.tree_map(lambda _: P(axis), stage_params),
                P())
    mapped = jax.shard_map(
        lambda p, m: body(jax.tree_util.tree_map(lambda q: q[0], p), m),
        mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False)
    return mapped(stage_params, microbatches)
