"""Checkpoint / resume for streaming pipeline state.

The reference has no checkpointing — its stream state (carrier estimate,
lock, symbol phase, Viterbi metrics + circular decision window, sample
counters) is implicit in process memory (SURVEY.md §5.4).  Here that
carry state is an explicit pytree, so checkpointing is just serializing
it; a long-running many-channel decode can stop and resume exactly.

Format (.npz, version 2): one array per leaf plus a JSON manifest that
records the format version and every leaf's keypath/dtype/shape, so a
restore validates structure, dtypes, and shapes against both the file
and the caller's template and fails loudly on mismatch instead of
silently transposing state.  Version-1 files (no manifest) still load.

Uses orbax-checkpoint when available, with this self-contained .npz
fallback for plain pytrees of arrays.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np

FORMAT_VERSION = 2


def _leaf_paths(tree: Any) -> tuple[list[str], list[Any], Any]:
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(kp) for kp, _ in leaves_with_paths]
    leaves = [leaf for _, leaf in leaves_with_paths]
    return paths, leaves, treedef


def save_pytree(path: str | os.PathLike, tree: Any) -> None:
    """Serialize a pytree of arrays (+ ints/floats) to ``path`` (.npz),
    with a versioned manifest of leaf keypaths/dtypes/shapes."""
    paths, leaves, _ = _leaf_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    manifest = {
        "format_version": FORMAT_VERSION,
        "nleaves": len(leaves),
        "leaves": [
            {
                "path": p,
                "dtype": str(arrays[f"leaf_{i}"].dtype),
                "shape": list(arrays[f"leaf_{i}"].shape),
            }
            for i, p in enumerate(paths)
        ],
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        __manifest__=np.frombuffer(
            json.dumps(manifest).encode(), dtype=np.uint8
        ),
        **arrays,
    )


def load_manifest(path: str | os.PathLike) -> dict | None:
    """Read the manifest of a checkpoint (None for version-1 files)."""
    with np.load(path) as data:
        if "__manifest__" in data.files:
            return json.loads(bytes(data["__manifest__"].tobytes()).decode())
    return None


def restore_pytree(path: str | os.PathLike, template: Any) -> Any:
    """Restore a pytree saved by save_pytree; ``template`` provides the
    structure (e.g. a freshly-constructed carry of the right shapes).
    Validates leaf count, keypaths, dtypes, and shapes against the
    manifest before touching any state."""
    data = np.load(path)
    paths, leaves, treedef = _leaf_paths(template)
    manifest = None
    if "__manifest__" in data.files:
        manifest = json.loads(bytes(data["__manifest__"].tobytes()).decode())
        if manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {manifest['format_version']} is newer "
                f"than supported {FORMAT_VERSION}"
            )
        if manifest["nleaves"] != len(leaves):
            raise ValueError(
                f"checkpoint has {manifest['nleaves']} leaves, template "
                f"has {len(leaves)}"
            )
        for i, (m, p) in enumerate(zip(manifest["leaves"], paths)):
            if m["path"] != p:
                raise ValueError(
                    f"leaf {i}: checkpoint path {m['path']!r} != template "
                    f"path {p!r} — structure changed since save"
                )
    restored = [np.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    for i, (new, old) in enumerate(zip(restored, leaves)):
        if hasattr(old, "shape") and tuple(new.shape) != tuple(np.shape(old)):
            raise ValueError(
                f"leaf {i} ({paths[i]}): shape {new.shape} != template "
                f"{np.shape(old)}"
            )
        old_dtype = getattr(old, "dtype", None)
        if old_dtype is not None and new.dtype != old_dtype:
            raise ValueError(
                f"leaf {i} ({paths[i]}): dtype {new.dtype} != template "
                f"{old_dtype}"
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
