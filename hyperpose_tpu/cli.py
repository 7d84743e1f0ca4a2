"""Command-line inference tool.

Mirrors the reference's hyperpose-cli flag surface
(reference: examples/cli.cpp:15-35 — --model --post --w --h
--max_batch_size --source --runtime --keep_ratio --saving_prefix --logging)
on top of the TPU engine and stream runtime.

    python -m hyperpose_tpu.cli --source video.mp4 --runtime stream
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description="hyperpose-tpu CLI")
    p.add_argument("--model", type=str, default="LightweightOpenpose",
                   help="model type or path to an exported npz weights file")
    p.add_argument("--backbone", type=str, default="Default")
    p.add_argument("--post", type=str, default="paf",
                   choices=["paf", "ppn", "pifpaf"],
                   help="post-processing family (usually implied by --model)")
    p.add_argument("--w", type=int, default=432, help="input width")
    p.add_argument("--h", type=int, default=368, help="input height")
    p.add_argument("--max_batch_size", type=int, default=None,
                   help="engine batch (default: auto-size to the measured "
                        "optimum for the backend/resolution)")
    p.add_argument("--source", type=str, required=True,
                   help="video file, camera index, or image folder")
    p.add_argument("--runtime", type=str, default="operator",
                   choices=["operator", "stream"])
    p.add_argument("--keep_ratio", action="store_true")
    p.add_argument("--low_latency", action="store_true", default=None,
                   help="dispatch partial batches immediately instead of "
                   "topping up to the full compiled batch (auto-enabled "
                   "for cameras and --imshow)")
    p.add_argument("--imshow", action="store_true",
                   help="display annotated frames in a window "
                        "(reference: cli.cpp --imshow)")
    p.add_argument("--alpha", type=float, default=1.0,
                   help="skeleton overlay blend factor "
                        "(reference: cli.cpp --alpha)")
    p.add_argument("--saving_prefix", type=str, default="output")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--logging", action="store_true")
    p.add_argument("--quantize", type=int, default=0, metavar="N",
                   help="calibrate on the first N source frames and serve "
                        "int8 (reference analog: int8 TFLite export, "
                        "export_tflite.py:29-41)")
    p.add_argument("--input_format", type=str, default="rgb8",
                   choices=["rgb8", "yuv420"],
                   help="device infeed format; yuv420 ships planar 4:2:0 "
                        "frames (half the host->device bytes) and "
                        "reconstructs RGB on-device")
    return p.parse_args()


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from . import config as Config
    from . import models as Model
    from .runtime.engine import PoseEngine
    from .train.checkpoint import load_weights_npz

    Config.reset()
    Config.set_model_type(Config.MODEL[args.model])
    Config.set_model_backbone(Config.BACKBONE[args.backbone])
    Config.set_model_inout(hin=args.h, win=args.w,
                           hout=args.h // 8, wout=args.w // 8)
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.h, args.w, 3), model.dtype), train=False,
    )
    if args.weights and os.path.exists(args.weights):
        variables = load_weights_npz(variables, args.weights)
        print(f"loaded weights: {args.weights}")
    fused = Model._fused_decode_for(cfg, model)
    engine = PoseEngine(
        model, variables, input_hw=(args.h, args.w),
        max_batch_size=args.max_batch_size, keep_ratio=args.keep_ratio,
        topology=Model.get_topology(cfg), fused_decode=fused,
        input_format=getattr(args, "input_format", "rgb8"),
    )
    return engine, Model.get_topology(cfg)


def _calibration_batches(args, engine):
    """First N source frames, resized to the engine input, chunked into
    engine-sized uint8 batches for int8 calibration."""
    import cv2
    import numpy as np

    h, w = engine.input_hw
    frames = []
    if os.path.isdir(args.source):
        paths = sorted(
            p for p in glob.glob(os.path.join(args.source, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png"))
        )[:args.quantize]
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            frames.append(cv2.resize(img, (w, h)))
    else:
        src = int(args.source) if args.source.isdigit() else args.source
        cap = cv2.VideoCapture(src)
        while len(frames) < args.quantize:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(cv2.cvtColor(f, cv2.COLOR_BGR2RGB),
                                     (w, h)))
        cap.release()
    if not frames:
        return []
    arr = np.stack(frames).astype(np.uint8)
    bs = engine.max_batch_size
    return [arr[i:i + bs] for i in range(0, len(arr), bs)]


def run_operator(args, engine, topo):
    """Batched image-folder mode (reference: cli.cpp:184-285)."""
    import cv2

    from .utils.human import draw_humans

    paths = sorted(
        p for p in glob.glob(os.path.join(args.source, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if args.limit:
        paths = paths[:args.limit]
    if not paths:
        print(f"no images found under {args.source}")
        return
    print(f"engine compile: {engine.warmup():.1f}s")
    os.makedirs(args.saving_prefix, exist_ok=True)
    t0 = time.perf_counter()
    n = 0
    for i in range(0, len(paths), engine.max_batch_size):
        chunk = paths[i:i + engine.max_batch_size]
        images = [
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in chunk
        ]
        results = engine.inference(images)
        for path, img, humans in zip(chunk, images, results):
            out = draw_humans(img, humans, topo, alpha=args.alpha)
            if args.imshow:
                cv2.imshow("hyperpose-tpu", cv2.cvtColor(out,
                                                         cv2.COLOR_RGB2BGR))
                cv2.waitKey(1)
            dst = os.path.join(
                args.saving_prefix, os.path.basename(path)
            )
            cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
            n += 1
    dt = time.perf_counter() - t0
    print(f"operator mode: {n} images in {dt:.2f}s -> {n / dt:.2f} FPS")


def run_stream(args, engine, topo):
    """Pipelined video mode (reference: cli.cpp:286-301 stream mode)."""
    from .runtime.stream import StreamProcessor

    print(f"engine compile: {engine.warmup():.1f}s")
    sp = StreamProcessor(engine)
    if args.logging:
        sp.add_queue_monitor(1000)
    out_path = f"{args.saving_prefix}.mp4"
    source = int(args.source) if args.source.isdigit() else args.source
    stats = sp.process_video(
        source, out_path, topology=topo, limit=args.limit,
        alpha=args.alpha, imshow=args.imshow,
        low_latency=args.low_latency,
    )
    print(
        f"stream mode: {stats['frames']} frames in {stats['seconds']:.2f}s "
        f"-> {stats['fps']:.2f} FPS ({stats['total_humans']} humans) "
        f"-> {out_path}"
    )


def main():
    args = parse_args()
    if args.logging:
        logging.basicConfig(level=logging.INFO)
    engine, topo = build_engine(args)
    if args.quantize:
        from . import quant

        batches = _calibration_batches(args, engine)
        if batches:
            t0 = time.perf_counter()
            engine = quant.quantize_engine(engine, batches)
            print(f"int8 calibration on {sum(len(b) for b in batches)} "
                  f"frames: {time.perf_counter() - t0:.1f}s "
                  f"({len(engine.quant_scales)} convs quantized)")
        else:
            print("warning: --quantize given but no calibration frames read")
    if args.runtime == "stream" or (
        not os.path.isdir(args.source)
    ):
        run_stream(args, engine, topo)
    else:
        run_operator(args, engine, topo)


if __name__ == "__main__":
    main()
