"""Tutorial: minimum stream-API program.

(reference: examples/stream_api_video_paf.example.cpp +
stream_api_video_pose_proposal.example.cpp — the five-line stream setup;
--post selects the parser family, mirroring the two reference programs.)

Usage:  python examples/tutorial_stream.py input.mp4 out.mp4 --post ppn
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
    ap.add_argument("output", nargs="?", default="tutorial_stream_out.mp4")
    ap.add_argument("--post", choices=sorted(POST_TO_MODEL), default="paf")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    # 1. configure the model family
    Config.reset()
    Config.set_model_type(POST_TO_MODEL[args.post])
    cfg = Config.get_config(create_dirs=False)

    # 2. build the model + (optionally trained) variables
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), model.dtype),
        train=False,
    )
    if args.weights:
        from hyperpose_tpu.train.checkpoint import load_weights_npz

        variables = load_weights_npz(variables, args.weights)

    # 3. fused engine (forward + on-device decode in one XLA program)
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win),
        fused_decode=Model._fused_decode_for(cfg, model),
    )

    # 4. pipelined stream: reader -> preproc pool -> device -> writer
    stream = StreamProcessor(engine)
    stats = stream.process_video(
        args.source, args.output, topology=Model.get_topology(cfg)
    )
    print(stats)


if __name__ == "__main__":
    main()
