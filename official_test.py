#!/usr/bin/env python
"""Generate test-server submission json (reference: official_test.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu import config as Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", type=str, default="LightweightOpenpose",
                   choices=[m.name for m in Config.MODEL])
    p.add_argument("--model_backbone", type=str, default="Default",
                   choices=[b.name for b in Config.BACKBONE])
    p.add_argument("--model_name", type=str, default="default_name")
    p.add_argument("--dataset_type", type=str, default="MSCOCO",
                   choices=[d.name for d in Config.DATA])
    p.add_argument("--dataset_path", type=str, default="./data")
    p.add_argument("--test_num", type=int, default=None)
    p.add_argument("--weights", type=str, default=None)
    args = p.parse_args()

    Config.set_model_name(args.model_name)
    Config.set_model_type(Config.MODEL[args.model_type])
    Config.set_model_backbone(Config.BACKBONE[args.model_backbone])
    Config.set_dataset_type(Config.DATA[args.dataset_type])
    Config.set_dataset_path(args.dataset_path)
    config = Config.get_config()

    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import models as Model
    from hyperpose_tpu.data.base import get_dataset
    from hyperpose_tpu.train.checkpoint import load_weights_npz

    model = Model.get_model(config)
    dataset = get_dataset(config)
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
        print(f"loaded {weights}")
    test = Model.get_test(config)
    out = test(model, variables, dataset, limit=args.test_num)
    print(f"submission json: {out}")


if __name__ == "__main__":
    main()
