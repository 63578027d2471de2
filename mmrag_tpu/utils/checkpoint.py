"""Checkpoint / resume: orbax param+opt-state checkpoints, versioned index
snapshots.

The reference *configures* a checkpoint dir but never uses it
(``/root/reference/config.py:31``, SURVEY §5 "checkpoint/resume: configured
but unused"); here it is real:

  * :func:`save_train_state` / :func:`restore_train_state` — orbax
    StandardCheckpointer over the ``{params, opt_state, step}`` pytree (the
    fine-tuning loop in :mod:`mmrag_tpu.parallel.training`), with retained-
    checkpoint GC.
  * :func:`snapshot_indexes` / :func:`restore_indexes` — point-in-time copies
    of the vector-index persistence files, named by per-user index versions,
    so an index can be rolled back independently of SQLite catalogs.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(
    checkpoint_dir: str, step: int, state: Dict[str, Any], keep: int = 3
) -> str:
    """Write ``state`` (any pytree) under ``checkpoint_dir/step_<n>``."""

    ocp = _ocp()
    path = os.path.join(os.path.abspath(checkpoint_dir), f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    _gc_checkpoints(checkpoint_dir, keep)
    return path


def latest_step(checkpoint_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(checkpoint_dir)
        if name.startswith("step_") and name.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_train_state(
    checkpoint_dir: str, target: Dict[str, Any], step: Optional[int] = None
) -> Dict[str, Any]:
    """Restore into the shape/sharding of ``target`` (abstract ok)."""

    ocp = _ocp()
    step = step if step is not None else latest_step(checkpoint_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {checkpoint_dir}")
    path = os.path.join(os.path.abspath(checkpoint_dir), f"step_{step:08d}")
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def _gc_checkpoints(checkpoint_dir: str, keep: int) -> None:
    steps = sorted(
        name for name in os.listdir(checkpoint_dir) if name.startswith("step_")
    )
    for name in steps[:-keep]:
        shutil.rmtree(os.path.join(checkpoint_dir, name), ignore_errors=True)


# ---------------------------------------------------------------------------
# Index snapshots
# ---------------------------------------------------------------------------

_INDEX_FILES = (
    "text_collection.npz",
    "text_collection.manifest.json",
    "image_collection.npz",
    "image_collection.manifest.json",
)


def snapshot_indexes(index_dir: str, checkpoint_dir: str, label: str = "") -> str:
    """Copy the current persisted index files into a timestamped snapshot."""

    stamp = time.strftime("%Y%m%d-%H%M%S")
    name = f"index-{stamp}" + (f"-{label}" if label else "")
    dest = os.path.join(checkpoint_dir, name)
    os.makedirs(dest, exist_ok=True)
    copied: List[str] = []
    for fname in _INDEX_FILES:
        src = os.path.join(index_dir, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(dest, fname))
            copied.append(fname)
    with open(os.path.join(dest, "snapshot.json"), "w") as fh:
        json.dump({"label": label, "created": time.time(), "files": copied}, fh)
    return dest


def list_index_snapshots(checkpoint_dir: str) -> List[str]:
    if not os.path.isdir(checkpoint_dir):
        return []
    return sorted(
        name for name in os.listdir(checkpoint_dir) if name.startswith("index-")
    )


def restore_indexes(snapshot_path: str, index_dir: str) -> List[str]:
    """Copy snapshot files back over the live index dir (engine must reload)."""

    os.makedirs(index_dir, exist_ok=True)
    restored = []
    for fname in _INDEX_FILES:
        src = os.path.join(snapshot_path, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(index_dir, fname))
            restored.append(fname)
    if not restored:
        raise FileNotFoundError(f"no index files in snapshot {snapshot_path}")
    return restored
