"""Streaming inference runtime: ordered video -> skeletons pipeline.

TPU-native redesign of the reference's pipeline-parallel stream scheduler
(reference: include/hyperpose/stream/stream.hpp:18-416, src/stream.cpp:18-183):
the same stage graph — read -> preprocess -> greedy batch -> DNN -> parse ->
write — but the DNN *and* the parser run fused on-device per batch (the
parser-replica thread pool of the reference is replaced by the vmapped
decoder), and the host stages hand frames through native C++ bounded queues
(runtime.native) so ordering is FIFO by construction.

    stream = StreamProcessor(engine)
    stream.add_queue_monitor(1000)
    for frame_result in stream.process_video("in.mp4", "out.mp4"):
        ...
"""
from __future__ import annotations

import dataclasses
import logging
import threading
import time
from typing import Iterator

import numpy as np

from ..utils.human import Human, SkeletonBatch, draw_humans
from .engine import PoseEngine

logger = logging.getLogger("hyperpose_tpu.MODEL")


@dataclasses.dataclass
class FrameResult:
    index: int
    frame: np.ndarray
    """Original frame as supplied by the source. RGB unless the pipeline ran
    with frames_bgr=True (headless process_video does), in which case it is
    BGR — check `frame_is_bgr` before drawing/saving."""
    humans: list[Human]
    frame_is_bgr: bool = False


class _PyQueue:
    """Pure-Python fallback with the NativeQueue interface."""

    def __init__(self, capacity: int):
        import queue

        self._q = queue.Queue(maxsize=capacity)
        self._closed = threading.Event()
        self.pushed = 0
        self.popped = 0

    def push(self, obj) -> bool:
        while not self._closed.is_set():
            try:
                self._q.put(obj, timeout=0.2)
                self.pushed += 1
                return True
            except Exception:
                continue
        return False

    def dump(self, max_items: int, timeout_ms: int = -1) -> list:
        import queue as qm

        items = []
        try:
            items.append(self._q.get(
                timeout=None if timeout_ms < 0 else timeout_ms / 1000
            ))
        except qm.Empty:
            if self._closed.is_set() and self._q.empty():
                raise EOFError from None
            return []
        while len(items) < max_items:
            try:
                items.append(self._q.get_nowait())
            except qm.Empty:
                break
        self.popped += len(items)
        return items

    def pop(self, timeout_ms: int = -1):
        return self.dump(1, timeout_ms)[0]

    def close(self):
        self._closed.set()

    def stats(self) -> dict:
        return {
            "size": self._q.qsize(), "capacity": self._q.maxsize,
            "pushed": self.pushed, "popped": self.popped,
            "closed": self._closed.is_set(),
        }


def _make_queue(capacity: int):
    try:
        from .native import NativeQueue

        return NativeQueue(capacity)
    except Exception:
        return _PyQueue(capacity)


class StreamProcessor:
    """Ordered, overlapped stream inference around a PoseEngine.

    Stage threads (reference: build_internal_running_graph,
    stream.hpp:260-275):
      reader   -> input_queue   (decoded RGB frames)
      preproc  -> resized_queue (model-input uint8 frames + original)
      device   -> result_queue  (greedy-batched fused forward+decode)
    Results are consumed in order from the caller's thread.
    """

    def __init__(self, engine: PoseEngine, queue_capacity: int | None = None):
        # Queues must hold at least two full device batches so the compiled
        # batch size is actually reachable (a 64-slot queue in front of a
        # statically compiled 128-batch would cap every dispatch at half
        # fill and pad the rest with zeros).
        if queue_capacity is None:
            queue_capacity = max(64, 2 * engine.max_batch_size)
        self.engine = engine
        self.input_q = _make_queue(queue_capacity)
        self.resized_q = _make_queue(queue_capacity)
        self.result_q = _make_queue(queue_capacity)
        self._threads: list[threading.Thread] = []
        self._monitor: threading.Thread | None = None
        self._stop = threading.Event()
        self._frames_bgr = False
        self._low_latency = False
        self.frames_in = 0
        self.frames_out = 0

    # -- stages --------------------------------------------------------------

    def _reader(self, frames: Iterator[np.ndarray]):
        idx = 0
        for frame in frames:
            if self._stop.is_set():
                break
            self.input_q.push((idx, frame))
            idx += 1
            self.frames_in = idx
        self.input_q.close()

    def _preproc(self):
        from . import native

        h, w = self.engine.input_hw
        use_native = native.get_lib() is not None
        while True:
            try:
                items = self.input_q.dump(8, timeout_ms=200)
            except EOFError:
                break
            for idx, frame in items:
                if use_native:
                    resized = np.empty((1, h, w, 3), np.uint8)
                    if native.resize_into_batch(frame, resized, 0) is None:
                        use_native = False
                    else:
                        resized = resized[0]
                if not use_native:
                    import cv2

                    resized = cv2.resize(frame, (w, h))
                if self._frames_bgr:
                    # Channel swap on the SMALL resized frame — resize is
                    # channel-agnostic, so headless video streaming skips
                    # the per-frame full-resolution cvtColor entirely.
                    resized = np.ascontiguousarray(resized[..., ::-1])
                # Compressed infeed: ship 4:2:0 YUV (half the bytes) when
                # the engine reconstructs RGB on-device.
                encode = getattr(self.engine, "encode_input", None)
                if encode is not None:
                    resized = encode(resized)
                self.resized_q.push((idx, frame, resized))
        self.resized_q.close()

    def _device_worker(self):
        bmax = self.engine.max_batch_size
        use_packed = hasattr(self.engine, "_step_packed")

        def dispatch(items):
            shape_fn = getattr(self.engine, "input_batch_shape", None)
            if shape_fn is not None:
                batch_buf = np.zeros(shape_fn(), np.uint8)
            else:
                h, w = self.engine.input_hw
                batch_buf = np.zeros((bmax, h, w, 3), np.uint8)
            for i, (_, _, resized) in enumerate(items):
                batch_buf[i] = resized
            if use_packed:
                return self.engine._step_packed(
                    self.engine.variables, batch_buf
                )
            return self.engine.infer_batch_device(batch_buf)

        def emit(items, pending):
            if use_packed:
                sk = self.engine.unpack_skeletons(np.asarray(pending))
            else:
                d = pending
                sk = SkeletonBatch(
                    np.asarray(d.coords), np.asarray(d.part_scores),
                    np.asarray(d.part_valid), np.asarray(d.scores),
                    np.asarray(d.valid),
                )
            for i, (idx, frame, _) in enumerate(items):
                self.result_q.push(FrameResult(
                    idx, frame, sk.to_humans(i),
                    frame_is_bgr=self._frames_bgr,
                ))

        # Double-buffered dispatch: batch k+1 is in flight while batch k's
        # (single, packed) device->host fetch completes — hides transfer
        # latency behind compute (replaces the reference's stage overlap via
        # parser replica threads, stream.hpp:347-385).
        # Greedy batching with a short fill window: each device dispatch
        # pays a fixed RPC round-trip (remote/tunneled backends: ~24 ms)
        # plus a statically compiled bmax-batch of device work regardless of
        # fill, so partial batches are disproportionately expensive. After
        # taking what's available, top up for <=50 ms toward a FULL batch
        # before dispatching (reference analog: dump-whatever-is-there,
        # stream.hpp:326-345 — extended for the fixed-shape/RPC regime).
        # Live sources (camera, imshow) instead run low-latency: dispatch
        # whatever arrived, no top-up wait.
        min_fill = 1 if self._low_latency else bmax
        in_flight: tuple | None = None
        closed = False
        while not closed:
            try:
                items = self.resized_q.dump(bmax, timeout_ms=200)
            except EOFError:
                break
            if items and len(items) < min_fill:
                deadline = time.perf_counter() + 0.05
                while len(items) < min_fill and time.perf_counter() < deadline:
                    try:
                        items.extend(self.resized_q.dump(
                            bmax - len(items), timeout_ms=10
                        ))
                    except EOFError:
                        closed = True
                        break
            if not items:
                if in_flight is not None:
                    emit(*in_flight)
                    in_flight = None
                continue
            pending = dispatch(items)
            if in_flight is not None:
                emit(*in_flight)
            in_flight = (items, pending)
        if in_flight is not None:
            emit(*in_flight)
        self.result_q.close()

    # -- public API ----------------------------------------------------------

    def process(
        self, frames: Iterator[np.ndarray], frames_bgr: bool = False,
        low_latency: bool = False,
    ) -> Iterator[FrameResult]:
        """Run the pipeline over an iterator of RGB frames; yields ordered
        FrameResults. frames_bgr=True accepts BGR frames (cv2 native) and
        swaps channels on the small resized frame instead — FrameResult
        .frame is then BGR too (and flagged frame_is_bgr). low_latency=True
        skips the batch top-up window: right for live sources whose frame
        rate can never fill a large compiled batch inside the window."""
        self._frames_bgr = frames_bgr
        self._low_latency = low_latency
        self._threads = [
            threading.Thread(target=self._reader, args=(frames,), daemon=True),
            threading.Thread(target=self._preproc, daemon=True),
            threading.Thread(target=self._device_worker, daemon=True),
        ]
        for t in self._threads:
            t.start()
        while True:
            try:
                result = self.result_q.pop(timeout_ms=1000)
            except TimeoutError:
                if not any(t.is_alive() for t in self._threads):
                    break
                continue
            except EOFError:
                break
            self.frames_out += 1
            yield result
        self.shutdown()

    def process_video(
        self, source: str, output: str | None = None,
        topology=None, limit: int | None = None,
        alpha: float = 1.0, imshow: bool = False,
        low_latency: bool | None = None,
    ) -> dict:
        """Video file/camera end-to-end (reference: examples/cli.cpp stream
        mode + write_to VideoWriter, src/stream.cpp:114-147).

        low_latency defaults to True for live sources (camera index or
        imshow display) — the batch top-up window would otherwise add up to
        50 ms/batch waiting for frames a 30 fps camera can't deliver."""
        import cv2

        is_camera = isinstance(source, int) or (
            isinstance(source, str) and source.isdigit()
        )
        if low_latency is None:
            low_latency = is_camera or imshow
        if is_camera and isinstance(source, str):
            source = int(source)
        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            raise IOError(f"cannot open video source {source}")
        fps_in = cap.get(cv2.CAP_PROP_FPS) or 30

        # Headless runs keep frames BGR end to end (no per-frame
        # full-resolution cvtColor); rendering paths convert so drawn
        # colors and written video stay correct.
        render = output is not None or imshow

        def frames():
            n = 0
            while limit is None or n < limit:
                ok, frame = cap.read()
                if not ok:
                    break
                yield (cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if render
                       else frame)
                n += 1
            cap.release()

        # Draw + encode runs on its own thread so the (CPU-heavy, ~20 ms/
        # frame) render path overlaps device batches instead of serializing
        # the consumer loop (the reference overlaps this via its pipeline
        # stage threads, stream.hpp:260-275). imshow stays on the consumer
        # thread (GUI calls are not thread-safe in cv2).
        import queue as _qm

        writer_q: _qm.Queue | None = None
        writer_thread = None
        if output is not None:

            def _writer_loop():
                writer = None
                while True:
                    item = writer_q.get()
                    if item is None:
                        break
                    frame, humans = item
                    if topology is not None:
                        frame = draw_humans(frame, humans, topology,
                                            alpha=alpha)
                    bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
                    if writer is None:
                        hh, ww = bgr.shape[:2]
                        writer = cv2.VideoWriter(
                            output, cv2.VideoWriter_fourcc(*"mp4v"),
                            fps_in, (ww, hh),
                        )
                    writer.write(bgr)
                if writer is not None:
                    writer.release()

            writer_q = _qm.Queue(maxsize=256)
            writer_thread = threading.Thread(target=_writer_loop,
                                             daemon=True)
            writer_thread.start()

        t0 = time.perf_counter()
        n_humans = 0
        for result in self.process(frames(), frames_bgr=not render,
                                   low_latency=low_latency):
            if writer_q is not None:
                writer_q.put((result.frame, result.humans))
            if imshow:
                out_frame = result.frame
                if topology is not None:
                    out_frame = draw_humans(
                        out_frame, result.humans, topology, alpha=alpha
                    )
                cv2.imshow("hyperpose-tpu",
                           cv2.cvtColor(out_frame, cv2.COLOR_RGB2BGR))
                cv2.waitKey(1)
            n_humans += len(result.humans)
        if writer_q is not None:
            writer_q.put(None)
            writer_thread.join(timeout=120)
        dt = time.perf_counter() - t0
        return {
            "frames": self.frames_out,
            "seconds": dt,
            "fps": self.frames_out / dt if dt > 0 else 0.0,
            "total_humans": n_humans,
        }

    def add_queue_monitor(self, interval_ms: int = 1000):
        """Periodic queue-size logging (reference: add_queue_monitor,
        src/stream.cpp:149-167)."""

        def monitor():
            last_out = -1
            stalled_for = 0
            while not self._stop.is_set():
                time.sleep(interval_ms / 1000)
                logger.info(
                    "stream monitor: input=%s resized=%s results=%s "
                    "in=%d out=%d",
                    self.input_q.stats()["size"],
                    self.resized_q.stats()["size"],
                    self.result_q.stats()["size"],
                    self.frames_in, self.frames_out,
                )
                # Stall watchdog (the reference only logs sizes;
                # src/stream.cpp:149-167): flag a pipeline that stops
                # making progress while work remains queued.
                if self.frames_out == last_out and (
                    self.input_q.stats()["size"]
                    or self.resized_q.stats()["size"]
                ):
                    stalled_for += 1
                    if stalled_for >= 5:
                        dead = [
                            i for i, t in enumerate(self._threads)
                            if not t.is_alive()
                        ]
                        logger.warning(
                            "stream STALLED for %d intervals (dead stage "
                            "threads: %s)", stalled_for, dead,
                        )
                else:
                    stalled_for = 0
                last_out = self.frames_out

        self._monitor = threading.Thread(target=monitor, daemon=True)
        self._monitor.start()

    def shutdown(self):
        """Clean shutdown (reference: ~basic_stream_manager,
        src/stream.cpp:169-183)."""
        self._stop.set()
        for q in (self.input_q, self.resized_q, self.result_q):
            q.close()
        for t in self._threads:
            t.join(timeout=2.0)
