"""Operator-API example: frame-by-frame video inference with any decoder.

(reference: examples/operator_api_video_paf.example.cpp and
operator_api_batched_images_{paf,pose_proposal,pifpaf}.example.cpp — the
--post flag selects the parser family, as in the C++ CLI.)
"""
import argparse

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from hyperpose_tpu import Config, Model
from hyperpose_tpu.runtime.engine import PoseEngine
from hyperpose_tpu.utils.human import draw_humans

POST_TO_MODEL = {
    "paf": Config.MODEL.LightweightOpenpose,
    "ppn": Config.MODEL.PoseProposal,
    "pifpaf": Config.MODEL.Pifpaf,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("--post", choices=sorted(POST_TO_MODEL), default="paf")
    ap.add_argument("--output", default="video_out.mp4")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    Config.reset()
    Config.set_model_type(POST_TO_MODEL[args.post])
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), model.dtype),
        train=False,
    )
    fused = Model._fused_decode_for(cfg, model)
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win),
        max_batch_size=args.batch, fused_decode=fused,
    )
    print(f"compile: {engine.warmup():.1f}s")

    topo = Model.get_topology(cfg)
    cap = cv2.VideoCapture(args.source)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    writer = None
    frames, batch = 0, []
    while True:
        ok, frame = cap.read()
        if not ok or (args.limit and frames >= args.limit):
            break
        batch.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        frames += 1
        if len(batch) == args.batch:
            for img, humans in zip(batch, engine.inference(batch)):
                out = draw_humans(img, humans, topo)
                if writer is None:
                    writer = cv2.VideoWriter(
                        args.output, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (out.shape[1], out.shape[0]),
                    )
                writer.write(cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
            batch = []
    if batch:
        pad = batch + [np.zeros_like(batch[0])] * (args.batch - len(batch))
        for img, humans in zip(batch, engine.inference(pad)[:len(batch)]):
            out = draw_humans(img, humans, topo)
            if writer is not None:
                writer.write(cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    cap.release()
    if writer is not None:
        writer.release()
    print(f"{frames} frames, {engine.stats.fps:.1f} model fps "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
