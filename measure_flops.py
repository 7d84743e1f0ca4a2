#!/usr/bin/env python
"""Analytical FLOPs of a configured model (reference: measure_flops.py)."""
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
    args = p.parse_args()
    Config.set_model_type(Config.MODEL[args.model_type])
    Config.set_model_backbone(Config.BACKBONE[args.model_backbone])
    cfg = Config.get_config(create_dirs=False)

    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import models as Model
    from hyperpose_tpu.utils.export import measure_flops

    model = Model.get_model(cfg)
    hw = (cfg.model.hin, cfg.model.win)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), model.dtype),
        train=False,
    )

    def fwd(x):
        out = model.apply(variables, x, train=False)
        return jax.tree.map(
            lambda v: v, {k: v for k, v in out.items()
                          if not isinstance(v, (list, tuple))}
        )

    stats = measure_flops(fwd, jnp.zeros((1, *hw, 3), model.dtype))
    n_params = sum(
        v.size for v in jax.tree.leaves(variables["params"])
    )
    print(f"{args.model_type} ({args.model_backbone}) @ {hw[0]}x{hw[1]}: "
          f"{stats['flops'] / 1e9:.2f} GFLOP/frame, "
          f"{n_params / 1e6:.2f} M params")


if __name__ == "__main__":
    main()
