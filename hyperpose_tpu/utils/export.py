"""Model export for deployment.

TPU-native equivalent of the reference's frozen-graph tooling
(reference: export_pb.py:66-104, export_tflite.py:29-41, measure_flops.py:
13-23):
  * weights as a flat .npz (portable),
  * a serialized AOT-compiled XLA executable via jax.export — the direct
    analog of a serialized TensorRT engine (src/tensorrt.cpp:463-471),
  * a frozen TensorFlow GraphDef .pb (jax2tf graph serialization — the
    reference's convert_variables_to_constants_v2 flow) for foreign
    runtimes; ONNX follows offline via `python -m tf2onnx.convert
    --graphdef model.pb`, exactly the reference's own offline ONNX recipe,
  * a .tflite flatbuffer (optionally uint8-quantized with a
    representative dataset, reference: export_tflite.py:29-41).
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


def export_pb(
    fn, input_shape, path: str, input_name: str = "input",
) -> str:
    """Freeze `fn(images_f32) -> dict/tuple of arrays` into a TF GraphDef
    .pb (reference: export_pb.py:87-104, convert_variables_to_constants_v2
    on the infer concrete function). The graph embeds the program as an
    XlaCallModule (StableHLO) node — current jax2tf removed pure-TF graph
    emission — so the artifact runs under any standard TF >= 2.12 runtime
    (validated by reload in tests/test_export_interchange.py); converters
    that require op-level TF graphs should consume the .tflite export or
    the serialized StableHLO instead."""
    import tensorflow as tf
    from jax.experimental import jax2tf
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2,
    )

    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[
            tf.TensorSpec(tuple(input_shape), tf.float32, name=input_name)
        ],
        autograph=False,
    )
    frozen = convert_variables_to_constants_v2(tf_fn.get_concrete_function())
    graph_def = frozen.graph.as_graph_def()
    out_dir = os.path.dirname(path) or "."
    os.makedirs(out_dir, exist_ok=True)
    tf.io.write_graph(graph_or_graph_def=graph_def, logdir=out_dir,
                      name=os.path.basename(path), as_text=False)
    return path


def export_tflite(
    fn, example_input, path: str,
    representative_inputs=None, quantize_uint8: bool = False,
) -> str:
    """Convert `fn(images_f32)` to a .tflite flatbuffer
    (reference: export_tflite.py:29-41). With quantize_uint8=True and a
    `representative_inputs` iterable of f32 arrays, performs full-integer
    uint8 quantization like the reference."""
    import tensorflow as tf

    converter = tf.lite.TFLiteConverter.experimental_from_jax(
        [fn], [[("images", np.asarray(example_input))]]
    )
    if quantize_uint8:
        if representative_inputs is None:
            raise ValueError(
                "uint8 quantization needs representative_inputs"
            )

        def rep():
            for arr in representative_inputs:
                yield [np.asarray(arr, np.float32)]

        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = rep
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8
        ]
        converter.inference_input_type = tf.uint8
        converter.inference_output_type = tf.uint8
    blob = converter.convert()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


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
