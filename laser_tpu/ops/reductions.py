"""Parallel floating-point reductions: sum / min / max.

TPU-native rebuild of the reference's reduction layer
(laser/primitives/reductions.nim:17-116 + simd_math/reductions_sse3.nim:11-59):
OpenMP chunking -> Pallas grid blocks; 4x SSE striped accumulators -> full VPU
pairwise tree within each block; omp_critical merge -> deterministic
grid-order combine into one VMEM-resident accumulator. Unlike the reference
(reductions.nim:55-63 documents
accepted FP non-determinism from thread timing), the reduction order here is
fixed by construction, so results are reproducible run to run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .foreach import map_reduce


def _identity(x):
    return x


def _dtype_of(x):
    return x.dtype if hasattr(x, "dtype") else jnp.asarray(x).dtype


def reduce_sum(x, *, acc_dtype=None, interpret=None) -> jax.Array:
    """Pairwise-tree sum (reference API: reductions.nim:97-102)."""
    return map_reduce(_identity, x, reduce_fn=jnp.sum, identity=0.0,
                      acc_dtype=acc_dtype, interpret=interpret)


def reduce_min(x, *, interpret=None) -> jax.Array:
    """(reference API: reductions.nim:104-109)"""
    dt = _dtype_of(x)
    big = np.inf if jnp.issubdtype(dt, jnp.floating) else np.iinfo(np.dtype(dt)).max
    return map_reduce(_identity, x, reduce_fn=jnp.min, identity=big,
                      interpret=interpret)


def reduce_max(x, *, interpret=None) -> jax.Array:
    """(reference API: reductions.nim:111-116)"""
    dt = _dtype_of(x)
    small = -np.inf if jnp.issubdtype(dt, jnp.floating) else np.iinfo(np.dtype(dt)).min
    return map_reduce(_identity, x, reduce_fn=jnp.max, identity=small,
                      interpret=interpret)


def reduce_mean(x, *, acc_dtype=None, interpret=None) -> jax.Array:
    from ..tensor import as_view

    v = as_view(x)
    return reduce_sum(x, acc_dtype=acc_dtype, interpret=interpret) / v.size


# ---------------------------------------------------------------------------
# Staged reductions with structured accumulators (the ex05 class the plain
# identity+binop map_reduce cannot express; VERDICT r1 #8).
# ---------------------------------------------------------------------------

def mean_var(x, *, interpret=None):
    """Single-pass mean and (population) variance.

    Per block: count/mean/M2 computed on the VPU; across blocks: Chan's
    parallel Welford combine — numerically stable, one read of the data
    (vs the naive two-pass or the cancellation-prone sum/sumsq trick).
    Returns (mean, var) as f32 scalars.
    """
    from .foreach import map_reduce_staged

    def block_fn(ctx, b):
        b = b.astype(jnp.float32)
        if ctx.valid is not None:
            n = jnp.sum(ctx.valid.astype(jnp.float32))
            nsafe = jnp.maximum(n, 1.0)
            m = jnp.sum(jnp.where(ctx.valid, b, 0.0)) / nsafe
            m2 = jnp.sum(jnp.where(ctx.valid, (b - m) ** 2, 0.0))
        else:
            n = jnp.float32(b.size)
            m = jnp.mean(b)
            m2 = jnp.sum((b - m) ** 2)
        return {"n": n, "mean": m, "m2": m2}

    def combine(a, b):
        n = a["n"] + b["n"]
        nsafe = jnp.maximum(n, 1.0)
        d = b["mean"] - a["mean"]
        mean = a["mean"] + d * b["n"] / nsafe
        m2 = a["m2"] + b["m2"] + d * d * a["n"] * b["n"] / nsafe
        return {"n": n, "mean": mean, "m2": m2}

    acc = map_reduce_staged(block_fn, x, combine=combine, interpret=interpret)
    return acc["mean"], acc["m2"] / jnp.maximum(acc["n"], 1.0)


def _arg_reduce(x, *, take_max: bool, interpret=None):
    from .foreach import map_reduce_staged

    dt = _dtype_of(x)
    if jnp.issubdtype(dt, jnp.floating):
        sentinel = -np.inf if take_max else np.inf
    else:
        info = np.iinfo(np.dtype(dt))
        sentinel = info.min if take_max else info.max

    def block_fn(ctx, b):
        ids = ctx.flat_indices(b.shape)
        if ctx.valid is not None:
            b = jnp.where(ctx.valid, b, jnp.asarray(sentinel, b.dtype))
        # first-occurrence convention: among equal values pick smallest index
        best = jnp.max(b) if take_max else jnp.min(b)
        hit = b == best
        idx = jnp.min(jnp.where(hit, ids, jnp.int32(2**31 - 1)))
        return {"val": best, "idx": idx}

    def combine(a, b):
        a_wins = (a["val"] > b["val"]) if take_max else (a["val"] < b["val"])
        tie = a["val"] == b["val"]
        val = jnp.where(a_wins, a["val"], b["val"])
        idx = jnp.where(a_wins, a["idx"],
                        jnp.where(tie, jnp.minimum(a["idx"], b["idx"]),
                                  b["idx"]))
        return {"val": val, "idx": idx}

    acc = map_reduce_staged(block_fn, x, combine=combine, interpret=interpret)
    return acc["idx"], acc["val"]


def argmax(x, *, interpret=None):
    """(flat_index, value) of the maximum — single fused pass, deterministic
    first-occurrence tie-breaking (numpy convention)."""
    return _arg_reduce(x, take_max=True, interpret=interpret)


def argmin(x, *, interpret=None):
    return _arg_reduce(x, take_max=False, interpret=interpret)
