"""Device-mesh utilities.

The reference's parallel substrate is single-node OpenMP (laser/openmp.nim);
its multi-socket partitioning sketch (gemm.nim:120-132, "one L3/NUMA domain
per socket") is exactly the role a ``jax.sharding.Mesh`` over ICI plays on
TPU. This module is the ergonomic layer: build meshes from whatever devices
exist (real chips or the virtual CPU mesh used in tests), name the standard
axes, and construct NamedShardings.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from ``axes`` (e.g. {"dp": 2, "tp": 4}).

    With no axes, all devices go on a single "dp" axis. Axis sizes may use -1
    once (inferred, like reshape).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {"dp": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        sizes[sizes.index(-1)] = n // known
    if math.prod(sizes) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    """NamedSharding(mesh, P(*spec)) shorthand."""
    return NamedSharding(mesh, P(*spec))


def shard_array(x: jax.Array, mesh: Mesh, *spec) -> jax.Array:
    """Place ``x`` with the given PartitionSpec (None entries replicate)."""
    return jax.device_put(x, sharding(mesh, *spec))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


# -- megatron boundary operators ---------------------------------------------
#
# Tensor-parallel training differentiates THROUGH shard_map regions whose
# value-replication metadata is off (check_vma=False: Pallas calls don't
# carry vma yet). jax then applies the *local* transpose rule at every
# collective boundary, which silently drops the cross-shard psum that
# replicated-operand cotangents need (see models/mlp.py / models/moe.py).
# The fix is the Megatron-LM pair of conjugate operators (arXiv:1909.08053
# §3, their f and g): each one pins down both transfer directions at one
# region boundary, so the rest of the region differentiates with plain
# local rules.


def copy_fwd_psum_bwd(axis: str):
    """Megatron's ``f``: identity forward, ``psum(axis)`` backward.

    Place at the ENTRY of a column-parallel region (the operand is
    replicated over ``axis``; each shard's branch produces an independent
    cotangent contribution that must be summed)."""

    @jax.custom_vjp
    def f(x):
        return x

    f.defvjp(lambda x: (x, None),
             lambda _, ct: (jax.lax.psum(ct, axis),))
    return f


def psum_fwd_copy_bwd(axis: str):
    """Megatron's ``g``: ``psum(axis)`` forward, identity backward.

    Place at the EXIT of a row-parallel region (shards hold partial sums
    of the output; the output's cotangent is replicated and each shard
    needs exactly its own copy)."""

    @jax.custom_vjp
    def g(x):
        return jax.lax.psum(x, axis)

    g.defvjp(lambda x: (jax.lax.psum(x, axis), None),
             lambda _, ct: (ct,))
    return g
