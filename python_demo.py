#!/usr/bin/env python
"""Single-image / folder demo (reference: /root/reference/python_demo.py)."""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu import config as Config


def parse_args():
    parser = argparse.ArgumentParser(description="Hyperpose-TPU demo")
    parser.add_argument("--model_type", type=str,
                        default="LightweightOpenpose",
                        choices=[m.name for m in Config.MODEL])
    parser.add_argument("--model_backbone", type=str, default="Default",
                        choices=[b.name for b in Config.BACKBONE])
    parser.add_argument("--model_name", type=str, default="default_name")
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./demo_output")
    parser.add_argument("--weights", type=str, default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    Config.set_model_name(args.model_name)
    Config.set_model_type(Config.MODEL[args.model_type])
    Config.set_model_backbone(Config.BACKBONE[args.model_backbone])
    config = Config.get_config()

    import cv2
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import models as Model
    from hyperpose_tpu.runtime.engine import PoseEngine
    from hyperpose_tpu.train.checkpoint import load_weights_npz
    from hyperpose_tpu.utils.human import draw_humans

    model = Model.get_model(config)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.model.hin, config.model.win, 3), model.dtype),
        train=False,
    )
    weights = args.weights or os.path.join(
        config.model.model_dir, "newest_model.npz"
    )
    if os.path.exists(weights):
        variables = load_weights_npz(variables, weights)
        print(f"loaded weights: {weights}")
    else:
        print(f"WARNING: no weights at {weights}; using random init")

    engine = PoseEngine(
        model, variables, input_hw=(config.model.hin, config.model.win),
        max_batch_size=4,
    )
    print(f"engine compile: {engine.warmup():.1f}s")
    topo = Model.get_topology(config)

    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(
        p for p in glob.glob(os.path.join(args.image_dir, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    for i in range(0, len(paths), 4):
        chunk = paths[i:i + 4]
        images = [
            cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in chunk
        ]
        results = engine.inference(images)
        for path, img, humans in zip(chunk, images, results):
            out = draw_humans(img, humans, topo)
            dst = os.path.join(args.output_dir, os.path.basename(path))
            cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
            print(f"{os.path.basename(path)}: {len(humans)} humans -> {dst}")
    print(f"engine throughput: {engine.stats.fps:.1f} fps")


if __name__ == "__main__":
    main()
