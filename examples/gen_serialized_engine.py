"""Precompile and serialize an inference engine for fast cold starts.

(reference: examples/gen_serialized_engine.example.cpp:19-48 — builds a
TensorRT engine once and saves the serialized plan; here the analog is the
AOT-exported StableHLO executable + weights, reloadable without retracing.)
"""
import argparse

import jax
import jax.numpy as jnp

from hyperpose_tpu import Config, Model
from hyperpose_tpu.runtime.engine import PoseEngine
from hyperpose_tpu.train.checkpoint import load_weights_npz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LightweightOpenpose")
    ap.add_argument("--backbone", default="Vggtiny")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--max_batch_size", type=int, default=8)
    ap.add_argument("--out_prefix", default="./engine/tinyvgg")
    args = ap.parse_args()

    Config.reset()
    Config.set_model_type(Config.MODEL[args.model])
    Config.set_model_backbone(Config.BACKBONE[args.backbone])
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.hin, cfg.model.win, 3), model.dtype),
        train=False,
    )
    if args.weights:
        variables = load_weights_npz(variables, args.weights)
    engine = PoseEngine(
        model, variables, input_hw=(cfg.model.hin, cfg.model.win),
        max_batch_size=args.max_batch_size,
        fused_decode=Model._fused_decode_for(cfg, model),
    )
    print(f"compile: {engine.warmup():.1f}s")
    paths = engine.save(args.out_prefix)
    for kind, path in paths.items():
        print(f"{kind}: {path}")
    # Reload without retracing:
    fn = PoseEngine.load_executable(paths["executable"])
    print(f"reloaded executable OK (callable: {fn.__qualname__})")


if __name__ == "__main__":
    main()
