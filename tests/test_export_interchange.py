"""Interchange export: frozen .pb and .tflite round-trips.

Closes the reference's foreign-runtime export surface (reference:
export_pb.py:87-104 frozen GraphDef via convert_variables_to_constants_v2,
export_tflite.py:29-41 TFLite incl. uint8 PTQ): a flax model is frozen
through jax2tf and the artifact is RELOADED in TensorFlow / the TFLite
interpreter and checked numerically against the jax forward. The .pb
embeds StableHLO (XlaCallModule — current jax2tf removed pure-TF graph
emission), so it runs under standard TF runtimes; op-level converters
should take the .tflite (validated incl. full-uint8 PTQ) instead.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperpose_tpu.models.backbones import VggTiny
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.utils.export import export_pb, export_tflite

HW = (64, 64)


@pytest.fixture(scope="module")
def small_model():
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False
    )

    def fwd(x):
        out = model.apply(variables, x, train=False)
        return {"conf_map": out["conf_map"], "paf_map": out["paf_map"]}

    x = np.random.default_rng(0).random((1, *HW, 3)).astype(np.float32)
    ref = jax.device_get(fwd(jnp.asarray(x)))
    return fwd, x, ref


def test_export_pb_roundtrip(small_model, tmp_path):
    import tensorflow as tf

    fwd, x, ref = small_model
    path = str(tmp_path / "frozen_model.pb")
    export_pb(fwd, (1, *HW, 3), path)

    graph_def = tf.compat.v1.GraphDef()
    with open(path, "rb") as f:
        graph_def.ParseFromString(f.read())
    # frozen: no variables left, single placeholder input
    ops = {n.op for n in graph_def.node}
    assert "VarHandleOp" not in ops and "Placeholder" in ops, ops

    @tf.function
    def run(inp):
        out = tf.graph_util.import_graph_def(
            graph_def, input_map={"input:0": inp},
            return_elements=["Identity:0", "Identity_1:0"],
        )
        return out

    got = [t.numpy() for t in run(tf.constant(x))]
    flat_ref = sorted(
        (np.asarray(v) for v in ref.values()), key=lambda a: a.shape
    )
    flat_got = sorted(got, key=lambda a: a.shape)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_export_tflite_roundtrip(small_model, tmp_path):
    import tensorflow as tf

    fwd, x, ref = small_model
    path = str(tmp_path / "model.tflite")
    export_tflite(fwd, x, path)

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    outs = [
        interp.get_tensor(d["index"]) for d in interp.get_output_details()
    ]
    flat_ref = sorted(
        (np.asarray(v) for v in ref.values()), key=lambda a: a.shape
    )
    flat_got = sorted(outs, key=lambda a: a.shape)
    assert len(flat_got) == 2
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_export_tflite_uint8(small_model, tmp_path):
    import tensorflow as tf

    fwd, x, ref = small_model
    path = str(tmp_path / "model_q.tflite")
    rng = np.random.default_rng(1)
    rep = [rng.random((1, *HW, 3)).astype(np.float32) for _ in range(4)]
    export_tflite(fwd, x, path, representative_inputs=rep,
                  quantize_uint8=True)
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    assert inp["dtype"] == np.uint8
    interp.set_tensor(inp["index"], (x * 255).astype(np.uint8))
    interp.invoke()
    out = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert out.dtype == np.uint8
