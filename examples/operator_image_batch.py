"""Operator-API example: batched image inference.

(reference: examples/operator_api_batched_images_paf.example.cpp)
"""
import glob
import sys

import cv2
import jax
import jax.numpy as jnp

from hyperpose_tpu import Config, Model
from hyperpose_tpu.runtime.engine import PoseEngine
from hyperpose_tpu.utils.human import draw_humans


def main(image_dir: str = "./images"):
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
                        input_hw=(cfg.model.hin, cfg.model.win))
    print(f"compile: {engine.warmup():.1f}s")

    topo = Model.get_topology(cfg)
    paths = sorted(glob.glob(f"{image_dir}/*.jpg"))[:engine.max_batch_size]
    images = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths]
    for path, img, humans in zip(paths, images, engine.inference(images)):
        out = draw_humans(img, humans, topo)
        dst = path.replace(".jpg", "_pose.png")
        cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        print(f"{path}: {len(humans)} humans -> {dst}")
    print(f"throughput: {engine.stats.fps:.1f} fps")


if __name__ == "__main__":
    main(*sys.argv[1:])
