"""Model export for deployment.

TPU-native equivalent of the reference's frozen-graph tooling
(reference: export_pb.py:66-104, export_tflite.py:29-41, measure_flops.py:
13-23): instead of .pb/.uff/.onnx for a TensorRT engine, we export
  * weights as a flat .npz (portable), and
  * a serialized AOT-compiled XLA executable via jax.export — the direct
    analog of a serialized TensorRT engine (src/tensorrt.cpp:463-471).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def export_npz(variables, path: str) -> str:
    from ..train.checkpoint import save_weights_npz

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_weights_npz(variables, path)
    return path


def export_serialized(
    fn, example_args, path: str, platform: str | None = None
) -> str:
    """Serialize an AOT-compiled jitted function (jax.export StableHLO).

    The artifact is portable across processes/binaries with the same
    jax/XLA version — the analog of gen_serialized_engine
    (reference: examples/gen_serialized_engine.example.cpp:19-48).
    """
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_serialized(path: str):
    """Load a serialized export; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    exported = jexport.deserialize(blob)
    return exported.call


def measure_flops(fn, *example_args) -> dict:
    """Analytical FLOPs/bytes of a jitted function via XLA cost analysis
    (reference: measure_flops.py uses the TF profiler)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {
        "flops": float(analysis.get("flops", float("nan"))),
        "bytes_accessed": float(analysis.get("bytes accessed", float("nan"))),
    }
