"""Tutorial: the minimum end-to-end prediction program.

(reference: examples/tutorial_api_minimum_operator.example.cpp and
tutorial_api_minimum_stream.example.cpp — build engine, run one image,
draw the skeletons.)
"""
import sys

import cv2
import jax
import jax.numpy as jnp

from hyperpose_tpu import Config, Model
from hyperpose_tpu.runtime.engine import PoseEngine
from hyperpose_tpu.train.checkpoint import load_weights_npz
from hyperpose_tpu.utils.human import draw_humans


def main(image_path: str, weights: str | None = None):
    # 1. Configure the model family/backbone (reference: Config setters).
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    cfg = Config.get_config(create_dirs=False)

    # 2. Build the model and (optionally) load trained weights.
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), model.dtype),
        train=False,
    )
    if weights:
        variables = load_weights_npz(variables, weights)

    # 3. One fused forward+decode engine call.
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win)
    )
    img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    humans = engine.inference([img])[0]

    # 4. Draw.
    out = draw_humans(img, humans, Model.get_topology(cfg))
    cv2.imwrite("tutorial_out.png", cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    print(f"{len(humans)} humans -> tutorial_out.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
