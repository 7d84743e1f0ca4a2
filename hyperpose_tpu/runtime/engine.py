"""Compiled pose-inference engine.

TPU-native counterpart of the reference's TensorRT engine wrapper
(reference: src/tensorrt.cpp:121-477 dnn::tensorrt): instead of a serialized
CUDA engine plus CPU parsers, the whole pipeline — normalize, CNN forward,
and PAF decode — is one fused XLA program per (batch, resolution) shape.
Preprocessing (letterbox) stays on host; everything after the uint8 batch
lands on device.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.paf_decode import PafDecoderConfig, paf_decode_batch
from ..utils.human import Human, SkeletonBatch
from ..utils.topology import COCO_TOPOLOGY, Topology
from ..utils import tracing


@dataclasses.dataclass
class EngineStats:
    """Rolling throughput counters (reference: examples/cli.cpp:231-301 FPS
    reporting)."""

    frames: int = 0
    seconds: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames / self.seconds if self.seconds else 0.0


def default_max_batch_size(input_hw: tuple[int, int]) -> int:
    """Auto-size the engine batch to the measured optimum for the backend.

    On TPU the early small-channel convs are lane-bound and amortize with
    batch: the recorded sweep for TinyVGG 432x368 on one v5e chip
    (BENCH_SELF.txt, `BENCH_BATCH=n python bench.py`) is 8 -> 1072,
    64 -> 1428, 128 -> 1747, 256 -> 1706 fps, so the default is 128,
    scaled down for larger
    resolutions by activation footprint (keeps peak activation HBM
    roughly constant). On CPU (tests, dev) large static batches only slow
    compilation down, so keep 8. The reference leaves this to the user
    (max_batch_size=8 default, reference:
    include/hyperpose/operator/dnn/tensorrt.hpp:46)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return 8
    h, w = input_hw
    ref_pixels = 368 * 432
    b = int(128 * ref_pixels / max(1, h * w))
    # round down to a power of two in [8, 128]
    p = 8
    while p * 2 <= min(b, 128):
        p *= 2
    return p


class PoseEngine:
    """Batched, fixed-shape pose inference: images -> skeletons.

    Equivalent surface to the reference engine + parser pair
    (reference: include/hyperpose/operator/dnn/tensorrt.hpp:44-123 and
    operator/parser/paf.hpp): `inference()` accepts a list of HWC uint8
    images, handles resize/letterbox + batching, and returns per-image
    `Human` lists.
    """

    def __init__(
        self,
        model,
        variables,
        input_hw: tuple[int, int] = (368, 432),
        max_batch_size: int | None = None,
        decoder: PafDecoderConfig | None = None,
        topology: Topology = COCO_TOPOLOGY,
        keep_ratio: bool = False,
        fused_decode=None,
        quant_scales: dict[str, float] | None = None,
        input_format: str = "rgb8",
    ):
        """fused_decode(variables, x_normalized) -> DecodedSkeletons
        overrides the default PAF-family path (PoseProposal / PifPaf).

        quant_scales: activation scale table from `hyperpose_tpu.quant
        .calibrate` — when given, every calibrated conv in the forward pass
        runs as int8 on the MXU (reference analog: the int8 TFLite export
        path, export_tflite.py:29-41, promoted here to a first-class serving
        mode).

        input_format: "rgb8" (uint8 [B,H,W,3]) or "yuv420" (planar I420
        uint8 [B,H*3/2,W] — half the host->device bytes; the chip
        reconstructs RGB fused into normalize, ops/image.yuv420_to_rgb).
        The reference ships full BGR frames over PCIe every batch
        (reference: src/tensorrt.cpp:364-434)."""
        self.model = model
        self.variables = jax.device_put(variables)
        self.input_hw = tuple(input_hw)
        if max_batch_size is None:
            max_batch_size = default_max_batch_size(input_hw)
        self.max_batch_size = int(max_batch_size)
        self.decoder = decoder or PafDecoderConfig()
        self.topology = topology
        self.keep_ratio = keep_ratio
        self.fused_decode = fused_decode
        self.quant_scales = dict(quant_scales) if quant_scales else None
        if input_format not in ("rgb8", "yuv420"):
            raise ValueError(f"unknown input_format {input_format!r}")
        if input_format == "yuv420" and (input_hw[0] % 4 or input_hw[1] % 2):
            raise ValueError(
                f"yuv420 infeed needs H%4==0 and W%2==0; got {input_hw}"
            )
        self.input_format = input_format
        self.stats = EngineStats()
        self._feat_hw: tuple[int, int] | None = None

    def input_batch_shape(self, batch: int | None = None) -> tuple[int, ...]:
        """Device-input array shape for this engine's format."""
        b = self.max_batch_size if batch is None else batch
        h, w = self.input_hw
        if self.input_format == "yuv420":
            return (b, h * 3 // 2, w)
        return (b, h, w, 3)

    def encode_input(self, rgb_u8: np.ndarray) -> np.ndarray:
        """Host-side encode of one resized RGB frame into the engine's
        infeed format (identity for rgb8, planar I420 for yuv420)."""
        if self.input_format == "yuv420":
            from ..ops.image import rgb_to_yuv420

            return rgb_to_yuv420(rgb_u8)
        return rgb_u8

    # -- device path ---------------------------------------------------------

    def _quant_ctx(self):
        """Context manager activating int8 convs during tracing (no-op when
        the engine is not quantized)."""
        if self.quant_scales is None:
            import contextlib

            return contextlib.nullcontext()
        from flax import linen as nn

        from ..quant import make_interceptor

        return nn.intercept_methods(make_interceptor(self.quant_scales))

    @functools.cached_property
    def _step(self):
        model, dec, topo = self.model, self.decoder, self.topology
        is_yuv = self.input_format == "yuv420"

        def to_u8_rgb(images):
            if not is_yuv:
                return images
            from ..ops.image import yuv420_to_rgb

            return (yuv420_to_rgb(images) + 0.5).astype(jnp.uint8)

        if self.fused_decode is not None:
            fused = self.fused_decode

            @jax.jit
            def custom(variables, images_u8):
                with self._quant_ctx():
                    return fused(variables, to_u8_rgb(images_u8))

            return custom

        @jax.jit
        def step(variables, images_u8):
            if is_yuv:
                from ..ops.image import yuv420_to_rgb

                x = (yuv420_to_rgb(images_u8) / 255.0).astype(model.dtype)
            else:
                x = images_u8.astype(model.dtype) / 255.0
            with self._quant_ctx():
                out = model.apply(variables, x, train=False)
            conf = out["conf_map"].astype(jnp.float32)
            paf = out["paf_map"].astype(jnp.float32)
            feat_hw = (conf.shape[1], conf.shape[2])
            return paf_decode_batch(conf, paf, dec, feat_hw, topo)

        return step

    @functools.cached_property
    def _step_packed(self):
        """Fused step returning ONE flat f32 array so remote/streaming hosts
        pay a single device->host transfer per batch."""
        step = self._step

        @jax.jit
        def packed(variables, images_u8):
            d = step(variables, images_u8)
            b = d.coords.shape[0]
            return jnp.concatenate([
                d.coords.reshape(b, -1),
                d.part_scores.reshape(b, -1),
                d.part_valid.astype(jnp.float32).reshape(b, -1),
                d.scores.reshape(b, -1),
                d.valid.astype(jnp.float32).reshape(b, -1),
            ], axis=1)

        return packed

    def unpack_skeletons(self, packed: np.ndarray) -> SkeletonBatch:
        if self.fused_decode is not None and not self._out_mh:
            raise RuntimeError(
                "call warmup() before the packed path on a custom-decoder "
                "engine (output dims are inferred from the compiled step)"
            )
        b = packed.shape[0]
        mh = self._out_mh or self.decoder.max_humans
        p = self._out_p or self.decoder.n_parts
        sizes = [mh * p * 2, mh * p, mh * p, mh, mh]
        offs = np.cumsum([0] + sizes)
        return SkeletonBatch(
            coords=packed[:, offs[0]:offs[1]].reshape(b, mh, p, 2),
            part_scores=packed[:, offs[1]:offs[2]].reshape(b, mh, p),
            part_valid=packed[:, offs[2]:offs[3]].reshape(b, mh, p) > 0.5,
            scores=packed[:, offs[3]:offs[4]].reshape(b, mh),
            valid=packed[:, offs[4]:offs[5]].reshape(b, mh) > 0.5,
        )

    def warmup(self) -> float:
        """Compile the fused step; returns compile seconds
        (reference analog: engine build, src/tensorrt.cpp:121-223)."""
        t0 = time.perf_counter()
        dummy = jnp.zeros(self.input_batch_shape(), jnp.uint8)
        out = self._step(self.variables, dummy)
        jax.block_until_ready(out.coords)
        self._out_mh = int(out.coords.shape[1])
        self._out_p = int(out.coords.shape[2])
        np.asarray(self._step_packed(self.variables, dummy))
        return time.perf_counter() - t0

    _out_mh: int = 0
    _out_p: int = 0

    def infer_batch_device(self, images_u8) -> Any:
        """Raw device decode of an already-batched uint8 array
        (shape per `input_batch_shape()`: [B,H,W,3] rgb8 or [B,H*3/2,W]
        yuv420)."""
        return self._step(self.variables, images_u8)

    # -- host path -----------------------------------------------------------

    def inference(self, images: Sequence[np.ndarray]) -> list[list[Human]]:
        """Full operator-style API (reference: tensorrt.cpp:436-461
        inference(vector<cv::Mat>) + parser process)."""
        import cv2

        h, w = self.input_hw
        batch = np.zeros((self.max_batch_size, h, w, 3), np.uint8)
        ratios: list[tuple[float, float]] = []
        n = len(images)
        if n > self.max_batch_size:
            raise ValueError(
                f"batch {n} exceeds max_batch_size {self.max_batch_size}"
            )
        from . import native

        with tracing.scope("engine/preprocess"):
            for i, img in enumerate(images):
                r = native.resize_into_batch(
                    img, batch, i, keep_ratio=self.keep_ratio
                )
                if r is not None:
                    ratios.append(r if self.keep_ratio else (1.0, 1.0))
                elif self.keep_ratio:
                    from ..ops.image import letterbox_resize

                    canvas, rx, ry = letterbox_resize(img, (h, w))
                    batch[i] = canvas
                    ratios.append((rx, ry))
                else:
                    batch[i] = cv2.resize(img, (w, h))
                    ratios.append((1.0, 1.0))
            if self.input_format == "yuv420":
                enc = np.zeros(self.input_batch_shape(), np.uint8)
                for i in range(n):
                    enc[i] = self.encode_input(batch[i])
                batch = enc
        t0 = time.perf_counter()
        with tracing.scope("engine/device_step"):
            decoded = self.infer_batch_device(jnp.asarray(batch))
            jax.block_until_ready(decoded.coords)
        self.stats.frames += n
        self.stats.seconds += time.perf_counter() - t0
        sk = SkeletonBatch(
            np.asarray(decoded.coords), np.asarray(decoded.part_scores),
            np.asarray(decoded.part_valid), np.asarray(decoded.scores),
            np.asarray(decoded.valid),
        )
        results = []
        for i in range(n):
            humans = sk.to_humans(i)
            rx, ry = ratios[i]
            if self.keep_ratio and (rx != 1.0 or ry != 1.0):
                humans = [hm.unletterboxed(rx, ry) for hm in humans]
            results.append(humans)
        return results

    # -- persistence ---------------------------------------------------------

    def save(self, path_prefix: str) -> dict[str, str]:
        """Persist weights + the serialized fused executable
        (reference analog: dnn::tensorrt::save, src/tensorrt.cpp:463-471)."""
        from ..utils.export import export_npz, export_serialized

        example = jnp.zeros(self.input_batch_shape(), jnp.uint8)
        variables = jax.device_get(self.variables)
        npz = export_npz(variables, path_prefix + ".npz")
        step = self._step

        def fn(images_u8):
            d = step(variables, images_u8)
            return d.coords, d.part_scores, d.part_valid, d.scores, d.valid

        exe = export_serialized(fn, (example,), path_prefix + ".stablehlo")
        return {"weights": npz, "executable": exe}

    @staticmethod
    def load_executable(path: str):
        """Load a serialized fused step; returns fn(images_u8) -> tuple
        (coords, part_scores, part_valid, scores, valid)."""
        from ..utils.export import load_serialized

        return load_serialized(path)
