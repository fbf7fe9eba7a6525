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
    arrays = {}
    dtypes = []
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        dtypes.append(str(a.dtype))
        if a.dtype.kind not in "biufc":
            # ml_dtypes leaves (bfloat16, fp8) don't survive the npz
            # format — store the raw bits; load_checkpoint views them
            # back using the recorded dtype name
            a = a.view(np.dtype(f"u{a.dtype.itemsize}"))
        arrays[f"leaf_{i}"] = a
    np.savez(base + ".npz" if not base.endswith(".npz") else base, **arrays)
    side = {"treedef": str(treedef), "num_leaves": len(leaves), "step": step,
            "metadata": metadata or {},
            "shapes": [list(np.shape(l)) for l in leaves],
            "dtypes": dtypes}
    with open(base + ".json", "w") as f:
        json.dump(side, f, indent=1)


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a checkpoint; ``like`` (an example pytree) restores structure.

    Without ``like``, returns (flat list of arrays, sidecar dict).
    """
    base = path[:-4] if path.endswith(".npz") else path
    data = np.load(base + ".npz")
    with open(base + ".json") as f:
        side = json.load(f)

    def leaf(i):
        a = data[f"leaf_{i}"]
        want = side["dtypes"][i]
        if a.dtype.kind not in "biufc" or str(a.dtype) != want:
            import ml_dtypes
            a = a.view(np.dtype(getattr(ml_dtypes, want, want)))
        return jnp.asarray(a)

    leaves = [leaf(i) for i in range(len(data.files))]
    if like is None:
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


def restore_shardings(tree: Any, like: Any) -> Any:
    """Re-place a loaded (host) pytree onto devices with ``like``'s
    shardings, leaf by leaf.

    Checkpoints are always written in plain logical layout
    (``save_checkpoint`` gathers sharded leaves to host via
    ``np.asarray``); distributed training states — ZeRO-1's flattened
    1/n-sharded moments/masters, megatron TP's column/row shards, GPipe's
    stage stacks — get their placement back from a LIVE state tree of the
    same structure (e.g. a fresh ``llama_train_init_zero1``). Exact
    resume: load_checkpoint -> restore_shardings -> keep stepping."""
    import jax.numpy as jnp

    def place(x, l):
        return jax.device_put(jnp.asarray(x), l.sharding)

    return jax.tree_util.tree_map(place, tree, like)
