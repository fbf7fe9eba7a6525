"""Checkpoint save/restore for model parameters.

SURVEY §5 notes the reference has NO checkpointing, and that its one
serialization remark is a warning: packed GEMM buffers are machine-specific
and must never be written to disk (gemm_prepacked.nim:120-123). This module
supplies the missing capability for the model layer with that warning
enforced: parameters are saved in their LOGICAL layout (plain row-major
arrays in an .npz), never in packed/tile/device layouts — repack on load.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, params: Any, *, step: int = 0,
                    metadata: dict | None = None) -> None:
    """Save a pytree of arrays to ``path`` (.npz + sidecar tree spec)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    for i, leaf in enumerate(leaves):
        if type(leaf).__name__ == "PackedMatrix":
            raise ValueError(
                "refusing to serialize a PackedMatrix (leaf %d): packed "
                "layouts are device/config-specific — save the logical "
                "matrix and repack on load" % i)
    base = path[:-4] if path.endswith(".npz") else path
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(base + ".npz" if not base.endswith(".npz") else base, **arrays)
    side = {"treedef": str(treedef), "num_leaves": len(leaves), "step": step,
            "metadata": metadata or {},
            "shapes": [list(np.shape(l)) for l in leaves],
            "dtypes": [str(np.asarray(l).dtype) for l in leaves]}
    with open(base + ".json", "w") as f:
        json.dump(side, f, indent=1)


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a checkpoint; ``like`` (an example pytree) restores structure.

    Without ``like``, returns (flat list of arrays, sidecar dict).
    """
    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    if like is None:
        with open(base + ".json") as f:
            side = json.load(f)
        return leaves, side
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# -- training-state checkpointing (params + optimizer moments + step) --------

def save_train_state(path: str, params: Any, m: Any, v: Any, step: int,
                     *, metadata: dict | None = None) -> None:
    """Checkpoint a full AdamW training state for exact resume: parameters,
    both moment trees, and the step count (bias correction depends on it)."""
    save_checkpoint(path, {"params": params, "m": m, "v": v}, step=step,
                    metadata=metadata)


def load_train_state(path: str, params_like: Any):
    """Restore (params, m, v, step) saved by ``save_train_state``."""
    like = {"params": params_like, "m": params_like, "v": params_like}
    state = load_checkpoint(path, like)
    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        step = json.load(f)["step"]
    return state["params"], state["m"], state["v"], step
