"""Streaming runtime: native queues + ordered pipeline."""
import threading
import time

import numpy as np
import pytest

from hyperpose_tpu.runtime.stream import StreamProcessor, _PyQueue, _make_queue


def test_native_queue_order_and_close():
    q = _make_queue(16)
    results = []

    def consumer():
        while True:
            try:
                results.extend(q.dump(4, timeout_ms=300))
            except EOFError:
                return

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(50):
        q.push(i)
    time.sleep(0.2)
    q.close()
    t.join(timeout=5)
    assert results == list(range(50))


def test_py_queue_fallback_semantics():
    q = _PyQueue(4)
    for i in range(4):
        q.push(i)
    assert q.dump(10, timeout_ms=100) == [0, 1, 2, 3]
    q.close()
    with pytest.raises(EOFError):
        q.dump(1, timeout_ms=50)


class _FakeEngine:
    """Minimal engine stand-in (reference analog: BUILD_FAKE backend)."""

    input_hw = (32, 32)
    max_batch_size = 4

    def infer_batch_device(self, batch):
        import types

        b = batch.shape[0]
        return types.SimpleNamespace(
            coords=np.zeros((b, 2, 18, 2), np.float32),
            part_scores=np.zeros((b, 2, 18), np.float32),
            part_valid=np.zeros((b, 2, 18), bool),
            scores=np.zeros((b, 2), np.float32),
            valid=np.zeros((b, 2), bool),
        )


def test_stream_pipeline_ordered():
    engine = _FakeEngine()
    sp = StreamProcessor(engine, queue_capacity=8)

    frames = (np.full((48, 64, 3), i, np.uint8) for i in range(30))
    indices = [r.index for r in sp.process(frames)]
    assert indices == list(range(30))
    assert sp.frames_out == 30


class _RecordingEngine(_FakeEngine):
    """Fake engine that records every dispatched batch."""

    def __init__(self):
        self.batches = []

    def infer_batch_device(self, batch):
        self.batches.append(np.asarray(batch).copy())
        return super().infer_batch_device(batch)


def test_stream_batch_fill_tops_up_to_full():
    """Throughput mode tops partial dumps up toward the full compiled batch
    (a statically compiled bmax-batch costs the same regardless of fill)."""
    engine = _RecordingEngine()
    sp = StreamProcessor(engine)
    # Default queue capacity covers >= 2 full batches.
    assert sp.input_q.stats()["capacity"] >= 2 * engine.max_batch_size

    frames = (np.full((48, 64, 3), i + 1, np.uint8) for i in range(32))
    results = list(sp.process(frames))
    assert [r.index for r in results] == list(range(32))
    fills = [int((b.reshape(b.shape[0], -1) != 0).any(axis=1).sum())
             for b in engine.batches]
    assert sum(fills) == 32
    # All but the final flush dispatch at full fill: the source outruns the
    # device here, so the 50 ms window always reaches bmax.
    assert all(f == engine.max_batch_size for f in fills[:-1])


def test_stream_low_latency_skips_topup():
    """low_latency dispatches whatever arrived instead of waiting out the
    fill window — a slow live source must not eat 50 ms/batch."""
    engine = _RecordingEngine()
    sp = StreamProcessor(engine)

    def slow_frames():
        for i in range(6):
            time.sleep(0.03)
            yield np.full((48, 64, 3), i + 1, np.uint8)

    t0 = time.perf_counter()
    results = list(sp.process(slow_frames(), low_latency=True))
    dt = time.perf_counter() - t0
    assert [r.index for r in results] == list(range(6))
    # 6 frames at ~30 ms spacing: with the 50 ms top-up this would take
    # >= 6 * 50 ms extra; low-latency keeps it near the source rate.
    assert len(engine.batches) >= 3
    assert dt < 1.0


def test_stream_frames_bgr_swaps_for_device():
    """frames_bgr=True: the device sees RGB (swap happens on the small
    resized frame) and FrameResult keeps + flags the original BGR frame."""
    engine = _RecordingEngine()
    sp = StreamProcessor(engine, queue_capacity=8)
    bgr = np.zeros((48, 64, 3), np.uint8)
    bgr[..., 0], bgr[..., 1], bgr[..., 2] = 30, 20, 10  # B,G,R

    results = list(sp.process(iter([bgr]), frames_bgr=True))
    assert len(results) == 1
    assert results[0].frame_is_bgr
    np.testing.assert_array_equal(results[0].frame, bgr)
    seen = engine.batches[0][0]  # first (only) filled slot, RGB order
    assert (seen[..., 0] == 10).all() and (seen[..., 2] == 30).all()


def test_process_video_writer_thread(tmp_path):
    """process_video with output=: frames flow through the threaded
    draw+encode writer and land in a readable mp4 with every frame."""
    cv2 = pytest.importorskip("cv2")
    from hyperpose_tpu.utils.topology import COCO_TOPOLOGY

    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(10):
        w.write(np.full((48, 64, 3), i * 20, np.uint8))
    w.release()

    engine = _RecordingEngine()
    sp = StreamProcessor(engine, queue_capacity=8)
    out = str(tmp_path / "out.mp4")
    stats = sp.process_video(src, out, topology=COCO_TOPOLOGY)
    assert stats["frames"] == 10
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10


def test_stream_monitor_runs():
    engine = _FakeEngine()
    sp = StreamProcessor(engine, queue_capacity=8)
    sp.add_queue_monitor(interval_ms=50)
    frames = (np.zeros((48, 64, 3), np.uint8) for _ in range(10))
    out = list(sp.process(frames))
    assert len(out) == 10


def test_engine_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import VggTiny
    from hyperpose_tpu.models.openpose import LightWeightOpenPose
    from hyperpose_tpu.runtime.engine import PoseEngine

    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.float32)
    hw = (32, 32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False
    )
    engine = PoseEngine(model, variables, input_hw=hw, max_batch_size=2)
    paths = engine.save(str(tmp_path / "eng"))
    fn = PoseEngine.load_executable(paths["executable"])
    x = np.random.default_rng(0).integers(0, 255, (2, *hw, 3), dtype=np.uint8)
    out_loaded = fn(jnp.asarray(x))
    out_live = engine.infer_batch_device(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_loaded[0]), np.asarray(out_live.coords), atol=1e-5
    )


def test_native_resize_matches_cv2():
    """Native bilinear resize/letterbox agrees with the cv2 host path
    within 1 LSB (reference analog: src/data.cpp:53-69 non_scaling_resize)."""
    cv2 = pytest.importorskip("cv2")
    from hyperpose_tpu.ops.image import letterbox_resize
    from hyperpose_tpu.runtime.native import get_lib, resize_into_batch

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (97, 203, 3), np.uint8)
    batch = np.zeros((2, 64, 48, 3), np.uint8)
    # plain stretch resize
    rx, ry = resize_into_batch(img, batch, 0)
    assert (rx, ry) == (1.0, 1.0)
    ref = cv2.resize(img, (48, 64))
    assert np.abs(batch[0].astype(int) - ref.astype(int)).max() <= 1
    # letterbox: placement, padding, and ratios match the python path
    rx, ry = resize_into_batch(img, batch, 1, keep_ratio=True)
    canvas, prx, pry = letterbox_resize(img, (64, 48))
    assert np.abs(batch[1].astype(int) - canvas.astype(int)).max() <= 1
    assert abs(rx - prx) < 1e-5 and abs(ry - pry) < 1e-5
    # channel swap + upscale
    up = np.zeros((1, 128, 256, 3), np.uint8)
    resize_into_batch(img, up, 0, swap_rb=True)
    refu = cv2.resize(img, (256, 128))[..., ::-1]
    assert np.abs(up[0].astype(int) - refu.astype(int)).max() <= 1
    # degenerate 1x1 source
    one = np.full((1, 1, 3), 77, np.uint8)
    resize_into_batch(one, up, 0)
    assert (up[0] == 77).all()


def test_native_batcher_copy():
    """Native uint8 batcher: exact copy + nearest resize."""
    import ctypes

    from hyperpose_tpu.runtime.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    src = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    dst = np.zeros((2, 4, 6, 3), np.uint8)
    lib.hp_copy_into_batch(
        src.ctypes.data_as(ctypes.c_char_p), 4, 6,
        dst.ctypes.data_as(ctypes.c_char_p), 1, 4, 6,
    )
    np.testing.assert_array_equal(dst[1], src)
    assert dst[0].sum() == 0
    # nearest resize 4x6 -> 2x3
    small = np.zeros((1, 2, 3, 3), np.uint8)
    lib.hp_copy_into_batch(
        src.ctypes.data_as(ctypes.c_char_p), 4, 6,
        small.ctypes.data_as(ctypes.c_char_p), 0, 2, 3,
    )
    np.testing.assert_array_equal(small[0, 0, 0], src[0, 0])
    np.testing.assert_array_equal(small[0, 1, 2], src[2, 4])


def test_native_pool_runs_tasks():
    from hyperpose_tpu.runtime.native import NativePool, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    pool = NativePool(2)
    results = []
    lock = threading.Lock()
    for i in range(32):
        def task(i=i):
            with lock:
                results.append(i)
        pool.enqueue(task)
    pool.wait()
    assert sorted(results) == list(range(32))
    pool.close()


def test_stream_reorders_shuffled_preproc():
    """The ordering guarantee under CONCURRENT preproc workers
    (reference: the single-writer ordering of stream.hpp:82-87): with
    several workers racing and per-frame jitter injected into the resize
    stage, results must still come out strictly in frame order."""
    rng = np.random.default_rng(3)

    class _JitterEngine(_FakeEngine):
        pass

    engine = _JitterEngine()
    sp = StreamProcessor(engine, n_preproc=3)
    orig_prep = sp._prep_frame

    def jittered(frame):
        time.sleep(float(rng.uniform(0, 0.004)))
        return orig_prep(frame)

    sp._prep_frame = jittered
    # frames carry their index in pixel 0 so identity is checkable
    frames = []
    for i in range(60):
        f = np.zeros((32, 32, 3), np.uint8)
        f[0, 0, 0] = i % 251
        frames.append(f)
    out = list(sp.process(iter(frames)))
    assert [r.index for r in out] == list(range(60))
    assert [int(r.frame[0, 0, 0]) for r in out] == [i % 251 for i in range(60)]
