"""Operator-API example: live imshow inference from a camera or video.

(reference: examples/operator_api_imshow_paf.example.cpp and
operator_api_imshow_pose_proposal.example.cpp — frame-by-frame inference
with an OpenCV display window; --post selects the parser family.)
"""
import argparse

import cv2
import jax
import jax.numpy as jnp

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
    ap.add_argument("--source", default="0",
                    help="camera index or video path")
    ap.add_argument("--post", choices=sorted(POST_TO_MODEL), default="paf")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no_display", action="store_true",
                    help="run headless (decode only, no cv2.imshow)")
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
    if args.weights:
        from hyperpose_tpu.train.checkpoint import load_weights_npz

        variables = load_weights_npz(variables, args.weights)
    fused = Model._fused_decode_for(cfg, model)
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win),
        max_batch_size=1, fused_decode=fused,
    )
    print(f"compile: {engine.warmup():.1f}s")
    topo = Model.get_topology(cfg)

    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)
    frames = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.limit and frames >= args.limit):
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        humans = engine.inference([rgb])[0]
        out = draw_humans(rgb, humans, topo)
        frames += 1
        if not args.no_display:
            cv2.imshow("hyperpose-tpu", cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    cap.release()
    if not args.no_display:
        cv2.destroyAllWindows()
    print(f"{frames} frames, {engine.stats.fps:.1f} model fps")


if __name__ == "__main__":
    main()
