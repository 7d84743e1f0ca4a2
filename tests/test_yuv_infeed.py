"""Compressed YUV 4:2:0 infeed: host encode + on-device RGB reconstruction.

The engine's yuv420 input format ships planar I420 frames (1.5 B/px, half
the host->device bytes of RGB8) and reconstructs RGB fused into normalize
(ops/image.yuv420_to_rgb). The reference ships full BGR frames to the GPU
every batch (reference: src/data.cpp:21-51, src/tensorrt.cpp:364-434).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu.ops.image import rgb_to_yuv420, yuv420_to_rgb


def _rand_rgb(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def test_yuv_roundtrip_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    rgb = _rand_rgb(rng, 64, 96)
    yuv = rgb_to_yuv420(rgb)
    assert yuv.shape == (96, 96) and yuv.dtype == np.uint8
    ours = np.asarray(yuv420_to_rgb(jnp.asarray(yuv[None])))[0]
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_yuv_numpy_fallback_encoder(rng, monkeypatch):
    """The cv2-free encoder path must stay close to cv2's I420."""
    cv2 = pytest.importorskip("cv2")
    rgb = _rand_rgb(rng, 32, 32)
    ref = rgb_to_yuv420(rgb)

    import hyperpose_tpu.ops.image as img

    real_import = __builtins__["__import__"] if isinstance(
        __builtins__, dict) else __import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("forced")
        return real_import(name, *a, **k)

    monkeypatch.setattr("builtins.__import__", no_cv2)
    fallback = img.rgb_to_yuv420(rgb)
    monkeypatch.undo()
    # cv2 rounds/averages slightly differently; stay within 2 code values.
    assert np.abs(fallback.astype(int) - ref.astype(int)).max() <= 2


def test_smooth_image_reconstruction_accuracy(rng):
    """On smooth content (real video-like), 4:2:0 loses almost nothing."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([
        127 + 100 * np.sin(xx / 9), 127 + 100 * np.cos(yy / 11),
        127 + 60 * np.sin((xx + yy) / 13),
    ], -1).clip(0, 255).astype(np.uint8)
    back = np.asarray(yuv420_to_rgb(jnp.asarray(rgb_to_yuv420(rgb)[None])))[0]
    assert np.abs(back - rgb.astype(np.float32)).mean() < 3.0


def _tiny_engine(input_format):
    import jax

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.models.openpose import LightWeightOpenPose
    from hyperpose_tpu.ops.paf_decode import PafDecoderConfig
    from hyperpose_tpu.runtime.engine import PoseEngine

    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    hw = (32, 48)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.float32),
        train=False,
    )
    dec = PafDecoderConfig(max_peaks=8, max_humans=4)
    return PoseEngine(
        model, variables, input_hw=hw, max_batch_size=2, decoder=dec,
        input_format=input_format,
    )


def test_engine_yuv_matches_rgb_decode(rng):
    """Same frame through rgb8 and yuv420 engines -> same skeleton slots
    (smooth synthetic input, so chroma subsampling is negligible)."""
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frame = np.stack([
        127 + 90 * np.sin(xx / 7), 127 + 90 * np.cos(yy / 9),
        127 + 50 * np.sin((xx + yy) / 11),
    ], -1).clip(0, 255).astype(np.uint8)

    e_rgb = _tiny_engine("rgb8")
    e_yuv = _tiny_engine("yuv420")
    assert e_yuv.input_batch_shape() == (2, 48, 48)

    batch_rgb = np.stack([frame, frame])
    batch_yuv = np.stack([e_yuv.encode_input(frame)] * 2)
    d_rgb = e_rgb.infer_batch_device(jnp.asarray(batch_rgb))
    d_yuv = e_yuv.infer_batch_device(jnp.asarray(batch_yuv))
    assert d_rgb.coords.shape == d_yuv.coords.shape
    # Validity pattern must agree; scores are close (inputs differ by <2/255)
    assert np.array_equal(
        np.asarray(d_rgb.valid), np.asarray(d_yuv.valid)
    )


def test_engine_yuv_shape_validation():
    with pytest.raises(ValueError):
        _ = _tiny_engine("bogus")

    import jax

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.models.openpose import LightWeightOpenPose
    from hyperpose_tpu.runtime.engine import PoseEngine

    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 30, 48, 3), jnp.float32),
        train=False,
    )
    with pytest.raises(ValueError):
        PoseEngine(model, variables, input_hw=(30, 48),
                   input_format="yuv420")


def test_stream_with_yuv_engine(rng):
    """Ordered stream pipeline end-to-end through the compressed infeed."""
    from hyperpose_tpu.runtime.stream import StreamProcessor

    engine = _tiny_engine("yuv420")
    sp = StreamProcessor(engine, queue_capacity=8)
    frames = (
        rng.integers(0, 256, (40, 60, 3), np.uint8) for _ in range(6)
    )
    results = list(sp.process(frames))
    assert [r.index for r in results] == list(range(6))
