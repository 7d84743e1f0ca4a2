"""Weight inspection utilities (reference: hyperpose/Model/examine.py:4-32)."""
from __future__ import annotations

import jax
import numpy as np


def exam_model_weights(variables, logger=print) -> list[tuple[str, tuple]]:
    """Print/return (name, shape) for every weight in a variables pytree."""
    rows = []
    for keypath, value in jax.tree_util.tree_flatten_with_path(variables)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        rows.append((name, tuple(np.shape(value))))
        logger(f"{name}: {tuple(np.shape(value))}")
    return rows


def exam_npz_dict_weights(path: str, logger=print) -> list[tuple[str, tuple]]:
    data = np.load(path)
    rows = [(k, tuple(data[k].shape)) for k in sorted(data.files)]
    for name, shape in rows:
        logger(f"{name}: {shape}")
    return rows


def compare_weights(variables, npz_path: str) -> dict[str, str]:
    """Diff a variables pytree against an npz dump; returns mismatches."""
    data = np.load(npz_path)
    problems = {}
    names = set(data.files)
    for name, shape in exam_model_weights(variables, logger=lambda *_: None):
        if name not in names:
            problems[name] = "missing in npz"
        elif tuple(data[name].shape) != shape:
            problems[name] = f"shape {tuple(data[name].shape)} != {shape}"
        names.discard(name)
    for extra in names:
        problems[extra] = "unused npz entry"
    return problems
