#!/usr/bin/env python
"""Export a configured model for deployment.

TPU-native analog of the reference export chain (reference: export_pb.py:
66-104 frozen graph, examples/gen_serialized_engine.example.cpp serialized
TensorRT engine): writes flat npz weights and a serialized AOT-compiled
fused forward(+decode) executable.
"""
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
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="./export")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--with_decode", action="store_true",
                   help="serialize forward+decode instead of forward only")
    p.add_argument("--format", nargs="*", default=["stablehlo"],
                   choices=["stablehlo", "pb", "tflite", "tflite_uint8"],
                   help="extra interchange artifacts (reference: "
                   "export_pb.py / export_tflite.py)")
    args = p.parse_args()

    Config.set_model_name(args.model_name)
    Config.set_model_type(Config.MODEL[args.model_type])
    Config.set_model_backbone(Config.BACKBONE[args.model_backbone])
    cfg = Config.get_config(create_dirs=False)

    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import models as Model
    from hyperpose_tpu.train.checkpoint import load_weights_npz
    from hyperpose_tpu.utils.export import (
        export_npz, export_serialized, measure_flops,
    )

    model = Model.get_model(cfg)
    hw = (cfg.model.hin, cfg.model.win)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), model.dtype),
        train=False,
    )
    weights = args.weights or os.path.join(
        cfg.model.model_dir, "newest_model.npz"
    )
    if os.path.exists(weights):
        variables = load_weights_npz(variables, weights)
        print(f"loaded {weights}")

    os.makedirs(args.output_dir, exist_ok=True)
    npz_path = os.path.join(args.output_dir, f"{args.model_name}.npz")
    export_npz(variables, npz_path)
    print(f"weights -> {npz_path}")

    if args.with_decode:
        post = Model.get_postprocessor(cfg)

        def fn(images_u8):
            x = images_u8.astype(model.dtype) / 255.0
            out = model.apply(variables, x, train=False)
            if cfg.model.model_type in (
                Config.MODEL.PoseProposal, Config.MODEL.Pifpaf
            ):
                d = post(out)
            else:
                d = post(
                    out["conf_map"].astype(jnp.float32),
                    out["paf_map"].astype(jnp.float32),
                )
            return d.coords, d.part_scores, d.part_valid, d.scores, d.valid
    else:
        def fn(images_u8):
            x = images_u8.astype(model.dtype) / 255.0
            out = model.apply(variables, x, train=False)
            return {k: v for k, v in out.items()
                    if not isinstance(v, (list, tuple))}

    example = jnp.zeros((args.batch_size, *hw, 3), jnp.uint8)
    if "stablehlo" in args.format:
        exe_path = os.path.join(
            args.output_dir, f"{args.model_name}.stablehlo"
        )
        export_serialized(fn, (example,), exe_path)
        print(f"serialized executable -> {exe_path}")
    if {"pb", "tflite", "tflite_uint8"} & set(args.format):
        from hyperpose_tpu.utils.export import export_pb, export_tflite

        def fwd_f32(x):
            out = model.apply(variables, x, train=False)
            return {k: v.astype(jnp.float32) for k, v in out.items()
                    if not isinstance(v, (list, tuple))}

        if "pb" in args.format:
            pb_path = os.path.join(
                args.output_dir, f"frozen_{args.model_name}.pb"
            )
            export_pb(fwd_f32, (args.batch_size, *hw, 3), pb_path)
            print(f"frozen graph -> {pb_path}")
        if "tflite" in args.format or "tflite_uint8" in args.format:
            import numpy as np

            ex = np.zeros((args.batch_size, *hw, 3), np.float32)
            tfl_path = os.path.join(
                args.output_dir, f"{args.model_name}.tflite"
            )
            rep = None
            if "tflite_uint8" in args.format:
                rng = np.random.default_rng(0)
                rep = [rng.random((args.batch_size, *hw, 3), np.float32)
                       for _ in range(8)]
            export_tflite(fwd_f32, ex, tfl_path,
                          representative_inputs=rep,
                          quantize_uint8="tflite_uint8" in args.format)
            print(f"tflite -> {tfl_path}")
    stats = measure_flops(fn, example)
    print(f"analytical cost: {stats['flops'] / 1e9:.2f} GFLOP / batch, "
          f"{stats['bytes_accessed'] / 1e6:.1f} MB accessed")


if __name__ == "__main__":
    main()
