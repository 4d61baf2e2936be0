"""Checkpoint / resume for streaming pipeline state.

The reference has no checkpointing — its stream state (carrier estimate,
lock, symbol phase, Viterbi metrics + circular decision window, sample
counters) is implicit in process memory (SURVEY.md §5.4).  Here that
carry state is an explicit pytree, so checkpointing is just serializing
it; a long-running many-channel decode can stop and resume exactly.

Uses orbax-checkpoint when available, with a self-contained .npz
fallback for plain pytrees of arrays.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    """Serialize a pytree of arrays (+ ints/floats) to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, __treedef__=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), **arrays)
    # treedef repr is only a debugging aid; restore requires a template.


def restore_pytree(path: str | os.PathLike, template: Any) -> Any:
    """Restore a pytree saved by save_pytree; ``template`` provides the
    structure (e.g. a freshly-constructed carry of the right shapes)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = [
        np.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    for i, (new, old) in enumerate(zip(restored, leaves)):
        if hasattr(old, "shape") and tuple(new.shape) != tuple(np.shape(old)):
            raise ValueError(
                f"leaf {i}: shape {new.shape} != template {np.shape(old)}"
            )
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_orbax(path: str | os.PathLike, tree: Any) -> bool:
    """Save with orbax (returns False if orbax is unavailable)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(Path(path).absolute(), tree, force=True)
    return True


def restore_orbax(path: str | os.PathLike, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(Path(path).absolute(), item=template)
