"""Multi-chip GEMM: shard_map over the mesh, local Pallas kernels, XLA
collectives over ICI.

SURVEY §2.3's parity-plus item: the reference's closest structure is threads
sharing a packed B panel while each owns a private A panel
(gemm.nim:155 vs :163-170). The chip-level analogs:

  strategy="row" : A row-sharded, B replicated  -> out row-sharded
                   (the omp_for-over-ic-panels loop, no communication)
  strategy="col" : A replicated, B col-sharded  -> out col-sharded
                   (the jr taskloop over B slivers)
  strategy="k"   : A col-sharded, B row-sharded -> local partial products
                   + psum/reduce_scatter over ICI (the kc loop turned into
                   a collective — no single-machine analog in the reference)

Each local shard multiply runs the flagship Pallas kernel from
ops/gemm/kernel.py unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.gemm import gemm


def gemm_sharded(a: jax.Array, b: jax.Array, mesh: Mesh, *,
                 axis: str = "dp", strategy: str = "row",
                 reduce_scatter: bool = False, **gemm_kwargs) -> jax.Array:
    """Distributed C = A @ B over ``mesh`` axis ``axis``."""
    if strategy == "row":
        in_specs = (P(axis, None), P(None, None))
        out_specs = P(axis, None)

        def f(ab, bb):
            return gemm(ab, bb, **gemm_kwargs)

    elif strategy == "col":
        in_specs = (P(None, None), P(None, axis))
        out_specs = P(None, axis)

        def f(ab, bb):
            return gemm(ab, bb, **gemm_kwargs)

    elif strategy == "k":
        in_specs = (P(None, axis), P(axis, None))
        if reduce_scatter:
            out_specs = P(axis, None)

            def f(ab, bb):
                part = gemm(ab, bb, **gemm_kwargs)
                return jax.lax.psum_scatter(part, axis, scatter_dimension=0,
                                            tiled=True)
        else:
            out_specs = P(None, None)

            def f(ab, bb):
                return jax.lax.psum(gemm(ab, bb, **gemm_kwargs), axis)

    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(a, b)
