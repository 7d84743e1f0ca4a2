"""int8 post-training quantization tests (reference parity:
export_tflite.py:29-41 int8 TFLite with representative dataset).

Checks: calibration finds every conv, quantized outputs track float outputs,
depthwise/grouped convs work (MobileNet), jit-compatibility, and the int8
export artifact round-trips exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperpose_tpu.models.backbones import MobilenetV1, VggTiny
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu import quant


@pytest.fixture(scope="module")
def lw_model():
    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 3)), train=False
    )
    x = jnp.asarray(
        np.random.default_rng(1).random((2, 64, 80, 3), np.float32)
    )
    return model, variables, x


def test_calibrate_covers_all_convs(lw_model):
    model, variables, x = lw_model
    scales = quant.calibrate(model, variables, [x], train=False)
    n_kernels = sum(
        1 for kp, _ in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]
        if "kernel" in jax.tree_util.keystr(kp)
    )
    assert len(scales) == n_kernels
    assert all(v > 0 for v in scales.values())


def test_quantized_output_close(lw_model):
    model, variables, x = lw_model
    scales = quant.calibrate(model, variables, [x], train=False)
    ref = model.apply(variables, x, train=False)
    q_apply = quant.quantized_apply(model, scales)
    got = jax.jit(lambda v, x: q_apply(v, x, train=False))(variables, x)
    for key in ("conf_map", "paf_map"):
        r = np.asarray(ref[key], np.float32)
        g = np.asarray(got[key], np.float32)
        scale = max(np.abs(r).max(), 1e-6)
        err = np.abs(r - g).max() / scale
        assert err < 0.15, f"{key}: relative err {err}"
        corr = np.corrcoef(r.ravel(), g.ravel())[0, 1]
        assert corr > 0.99, f"{key}: corr {corr}"


def test_skip_keeps_float(lw_model):
    model, variables, x = lw_model
    scales = quant.calibrate(model, variables, [x], train=False)
    q_all_skipped = quant.quantized_apply(model, scales, skip=lambda p: True)
    ref = model.apply(variables, x, train=False)
    got = q_all_skipped(variables, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(ref["conf_map"]), np.asarray(got["conf_map"])
    )


def test_depthwise_grouped_conv():
    model = MobilenetV1(dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    x = jnp.asarray(
        np.random.default_rng(2).random((1, 64, 64, 3), np.float32)
    )
    scales = quant.calibrate(model, variables, [x], train=False)
    q_apply = quant.quantized_apply(model, scales)
    ref = np.asarray(model.apply(variables, x, train=False), np.float32)
    got = np.asarray(q_apply(variables, x, train=False), np.float32)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ref - got).max() / scale < 0.2
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.98


def test_quantized_engine_matches_float_decode(lw_model):
    """An int8 PoseEngine decodes the same synthetic scene as the float one
    (engine analog of the int8 TFLite serving path)."""
    from hyperpose_tpu.runtime.engine import PoseEngine
    from hyperpose_tpu import quant as q

    model, variables, _ = lw_model
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 64, 80, 3), np.uint8)
    eng = PoseEngine(model, variables, input_hw=(64, 80), max_batch_size=2)
    qeng = q.quantize_engine(eng, [frames])
    assert qeng.quant_scales and all(v > 0 for v in qeng.quant_scales.values())
    a = eng.infer_batch_device(jnp.asarray(frames))
    b = qeng.infer_batch_device(jnp.asarray(frames))
    assert np.asarray(b.coords).shape == np.asarray(a.coords).shape
    assert np.asarray(b.valid).shape == np.asarray(a.valid).shape
    # Host-path API works on the quantized engine too.
    humans = qeng.inference([frames[0]])
    assert isinstance(humans, list) and len(humans) == 1


def test_export_roundtrip(tmp_path, lw_model):
    model, variables, x = lw_model
    scales = quant.calibrate(model, variables, [x], train=False)
    path = str(tmp_path / "lw_int8.npz")
    quant.export_quantized(model, variables, scales, path)

    loaded_scales, tensors = quant.load_quantized(path)
    assert loaded_scales == pytest.approx(scales)

    deq = quant.dequantized_params(variables, tensors)
    q_apply = quant.quantized_apply(model, scales)
    a = np.asarray(
        q_apply(variables, x, train=False)["conf_map"], np.float32)
    b = np.asarray(q_apply(deq, x, train=False)["conf_map"], np.float32)
    # Re-quantization of dequantized weights is exact -> identical outputs.
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
