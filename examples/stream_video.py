"""Stream-API example: pipelined video inference.

(reference: examples/stream_api_video_paf.example.cpp and the tutorial
pair examples/tutorial_api_*.cpp)
"""
import sys

import jax
import jax.numpy as jnp

from hyperpose_tpu import Config, Model
from hyperpose_tpu.runtime.engine import PoseEngine
from hyperpose_tpu.runtime.stream import StreamProcessor


def main(source: str, output: str = "stream_out.mp4"):
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    cfg = Config.get_config(create_dirs=False)

    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), model.dtype),
        train=False,
    )
    engine = PoseEngine(model, variables,
                        input_hw=(cfg.model.hin, cfg.model.win),
                        max_batch_size=16)
    print(f"compile: {engine.warmup():.1f}s")

    stream = StreamProcessor(engine)
    stream.add_queue_monitor(1000)
    stats = stream.process_video(
        source, output, topology=Model.get_topology(cfg)
    )
    print(stats)


if __name__ == "__main__":
    main(*sys.argv[1:])
