"""Checkpoint / resume via orbax + npz weight export.

TPU-native counterpart of the reference's tf.train.Checkpoint +
npz_dict weight files (reference: Model/train.py:161,184-207,310-325).
Stores params, batch_stats, opt_state and step; also exports/imports a flat
.npz of weights for interchange (reference: examine.py conventions).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    def __init__(self, model_dir: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.path = os.path.abspath(os.path.join(model_dir, "ckpt"))
        os.makedirs(self.path, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: dict[str, Any]):
        ocp = _ocp()
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mngr.latest_step()

    def restore(self, state_like: dict[str, Any], step: int | None = None):
        ocp = _ocp()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )
        return step, restored


def save_weights_npz(variables: dict, path: str) -> None:
    """Flatten a variables pytree into a name->array npz
    (reference: npz_dict save, Model/train.py:318-319)."""
    flat = {}
    for keypath, value in jax.tree_util.tree_flatten_with_path(variables)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(value)
    np.savez(path, **flat)


def load_npz_tree(path: str) -> dict:
    """Rebuild the nested dict a save_weights_npz flat npz came from
    (no template needed; used by tolerant partial loads like the
    pretrained-backbone graft)."""
    data = np.load(path)
    tree: dict = {}
    for name in data.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[name]
    return tree


def load_weights_npz(variables: dict, path: str) -> dict:
    """Restore a variables pytree from a flat npz written by
    save_weights_npz (shape-checked)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    new_leaves = []
    for keypath, value in leaves:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        if name not in data:
            raise KeyError(f"weight {name} missing from {path}")
        arr = data[name]
        if arr.shape != value.shape:
            raise ValueError(
                f"{name}: shape {arr.shape} != expected {value.shape}"
            )
        new_leaves.append(arr.astype(value.dtype))
    return jax.tree_util.tree_unflatten(
        treedef, new_leaves
    )
