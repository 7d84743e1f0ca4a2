#!/usr/bin/env python
"""Stream-mode end-to-end benchmark (reference protocol:
docs/markdown/performance/prediction.md:19-21 — FPS over a 640x360 test
video through the full pipeline: video decode -> host preproc -> device
forward+decode -> draw -> encode).

Prints one JSON line per configuration:
  {"metric": "stream_fps_tinyvgg_432x368", "value": ..., ...}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

VIDEO = "/tmp/bench_stream_640x360.mp4"


def _provenance() -> dict:
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    return {"commit": commit, "date": datetime.date.today().isoformat()}


def ensure_video(n_frames: int, hw=(360, 640), seed=0) -> str:
    """Synthesize the test video once: moving articulated figures over a
    textured background (cv2; no network needed)."""
    import cv2

    from hyperpose_tpu.data.synthetic import render_scene

    marker = VIDEO + f".{n_frames}.ok"
    if os.path.exists(VIDEO) and os.path.exists(marker):
        return VIDEO
    rng = np.random.default_rng(seed)
    writer = cv2.VideoWriter(
        VIDEO, cv2.VideoWriter_fourcc(*"mp4v"), 30, (hw[1], hw[0])
    )
    # a handful of keyframe scenes, cross-faded + translated for motion
    scenes = [render_scene(rng, hw)[0] for _ in range(8)]
    for i in range(n_frames):
        a = scenes[(i // 60) % len(scenes)]
        b = scenes[(i // 60 + 1) % len(scenes)]
        t = (i % 60) / 60.0
        frame = (a.astype(np.float32) * (1 - t) + b.astype(np.float32) * t)
        shift = int(20 * np.sin(i / 15.0))
        frame = np.roll(frame, shift, axis=1)
        writer.write(cv2.cvtColor(frame.astype(np.uint8), cv2.COLOR_RGB2BGR))
    writer.release()
    open(marker, "w").close()
    return VIDEO


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--model", default="LightweightOpenpose")
    ap.add_argument("--backbone", default="Vggtiny")
    ap.add_argument("--max_batch_size", type=int, default=None)
    ap.add_argument("--write_output", action="store_true",
                    help="also draw + encode an output video (the "
                    "reference protocol writes one)")
    ap.add_argument("--yuv", action="store_true",
                    help="YUV 4:2:0 compressed infeed (halves the "
                    "host->device bytes; this environment's tunnel is the "
                    "stream bottleneck)")
    ap.add_argument("--host_only", action="store_true",
                    help="replace the device step with a no-op to measure "
                    "the host pipeline ceiling (read+preproc+batch+emit)")
    ap.add_argument("--weights", default="weights/flagship_tinyvgg.npz",
                    help="trained weights: a flat npz (weights/ published "
                    "by scripts/retrain_flagship.py) or a model_dir with "
                    "an orbax ckpt/, so frames decode to real humans (the "
                    "reference protocol measures drawn output); "
                    "'none' benchmarks random-init weights. A missing "
                    "path is an ERROR — rows must be reproducible")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import Config, Model
    from hyperpose_tpu.runtime.engine import PoseEngine
    from hyperpose_tpu.runtime.stream import StreamProcessor

    source = ensure_video(args.frames)

    Config.reset()
    Config.set_model_type(Config.MODEL[args.model])
    Config.set_model_backbone(Config.BACKBONE[args.backbone])
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), model.dtype),
        train=False,
    )
    trained = False
    ckpt_dir = os.path.join(args.weights, "ckpt")
    if args.weights == "none":
        pass
    elif args.weights.endswith(".npz") and os.path.exists(args.weights):
        from hyperpose_tpu.train.checkpoint import load_weights_npz

        variables = load_weights_npz(variables, args.weights)
        trained = True
    elif os.path.isdir(ckpt_dir):
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
        state = mngr.restore(mngr.latest_step())
        variables = {
            "params": state["params"], "batch_stats": state["batch_stats"],
        }
        trained = True
    else:
        raise SystemExit(
            f"trained weights not found at {args.weights!r} — the stream "
            "rows must be measured with trained weights (reference "
            "protocol). Recreate them with scripts/retrain_flagship.py, "
            "or pass --weights none to benchmark random init explicitly."
        )
    kwargs = {}
    if args.max_batch_size:
        kwargs["max_batch_size"] = args.max_batch_size
    if args.yuv:
        kwargs["input_format"] = "yuv420"
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win),
        fused_decode=Model._fused_decode_for(cfg, model), **kwargs,
    )
    if args.host_only:
        import types

        class _HostOnlyEngine:
            """Engine facade whose device step is a host no-op: measures
            the pure host pipeline (decode+preproc+batch+emit) ceiling."""

            input_hw = engine.input_hw
            max_batch_size = engine.max_batch_size
            input_format = engine.input_format
            input_batch_shape = staticmethod(engine.input_batch_shape)

            @staticmethod
            def infer_batch_device(batch):
                b = batch.shape[0]
                return types.SimpleNamespace(
                    coords=np.zeros((b, 8, 19, 2), np.float32),
                    part_scores=np.zeros((b, 8, 19), np.float32),
                    part_valid=np.zeros((b, 8, 19), bool),
                    scores=np.zeros((b, 8), np.float32),
                    valid=np.zeros((b, 8), bool),
                )

        engine = _HostOnlyEngine()
        compile_s = 0.0
    else:
        compile_s = engine.warmup()

    stream = StreamProcessor(engine)
    t0 = time.perf_counter()
    stats = stream.process_video(
        source, output="/tmp/bench_stream_out.mp4" if args.write_output
        else None,
        topology=Model.get_topology(cfg) if args.write_output else None,
    )
    wall = time.perf_counter() - t0
    frames = stats.get("frames", args.frames)
    fps = frames / wall
    print(json.dumps({
        "metric": ("stream_host_only" if args.host_only else
                   f"stream_fps_{args.backbone.lower()}_"
                   f"{cfg.model.win}x{cfg.model.hin}"
                   + ("_yuv420" if args.yuv else "")),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 124.925, 3),
        "detail": {
            "frames": frames, "wall_s": round(wall, 2),
            "compile_s": round(compile_s, 1),
            "max_batch_size": engine.max_batch_size,
            "write_output": bool(args.write_output),
            "trained_weights": trained,
            "stats": {k: v for k, v in stats.items()
                      if isinstance(v, (int, float))},
            **_provenance(),
        },
    }))


if __name__ == "__main__":
    main()
