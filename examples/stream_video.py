"""Stream-API example: pipelined video inference for any parser family.

(reference: examples/stream_api_video_paf.example.cpp and
stream_api_video_pose_proposal.example.cpp — --post selects the family.)
"""
import argparse

import jax
import jax.numpy as jnp

from hyperpose_tpu import Config, Model
from hyperpose_tpu.runtime.engine import PoseEngine
from hyperpose_tpu.runtime.stream import StreamProcessor

POST_TO_MODEL = {
    "paf": Config.MODEL.LightweightOpenpose,
    "ppn": Config.MODEL.PoseProposal,
    "pifpaf": Config.MODEL.Pifpaf,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("output", nargs="?", default="stream_out.mp4")
    ap.add_argument("--post", choices=sorted(POST_TO_MODEL), default="paf")
    ap.add_argument("--backbone", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--max_batch_size", type=int, default=None)
    args = ap.parse_args()

    Config.reset()
    Config.set_model_type(POST_TO_MODEL[args.post])
    if args.backbone:
        Config.set_model_backbone(Config.BACKBONE[args.backbone])
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
    kwargs = {}
    if args.max_batch_size:
        kwargs["max_batch_size"] = args.max_batch_size
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win),
        fused_decode=Model._fused_decode_for(cfg, model), **kwargs,
    )
    print(f"compile: {engine.warmup():.1f}s")

    stream = StreamProcessor(engine)
    stream.add_queue_monitor(1000)
    stats = stream.process_video(
        args.source, args.output, topology=Model.get_topology(cfg)
    )
    print(stats)


if __name__ == "__main__":
    main()
