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
