"""Parallel floating-point reductions: sum / min / max.

TPU-native rebuild of the reference's reduction layer
(laser/primitives/reductions.nim:17-116 + simd_math/reductions_sse3.nim:11-59):
OpenMP chunking -> Pallas grid blocks; 4x SSE striped accumulators -> full VPU
pairwise tree within each block; omp_critical merge -> deterministic
cross-block tree combine. Unlike the reference (reductions.nim:55-63 documents
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
