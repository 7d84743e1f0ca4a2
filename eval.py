#!/usr/bin/env python
"""Evaluation entry point (reference: /root/reference/eval.py CLI surface)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu import config as Config


def parse_args():
    parser = argparse.ArgumentParser(description="Hyperpose-TPU evaluation")
    parser.add_argument("--model_type", type=str,
                        default="LightweightOpenpose",
                        choices=[m.name for m in Config.MODEL])
    parser.add_argument("--model_backbone", type=str, default="Default",
                        choices=[b.name for b in Config.BACKBONE])
    parser.add_argument("--model_name", type=str, default="default_name")
    parser.add_argument("--dataset_type", type=str, default="MSCOCO",
                        choices=[d.name for d in Config.DATA])
    parser.add_argument("--dataset_version", type=str, default="2017")
    parser.add_argument("--dataset_path", type=str, default="./data")
    parser.add_argument("--eval_num", type=int, default=None,
                        help="number of images to evaluate (None = all)")
    parser.add_argument("--multiscale", action="store_true")
    parser.add_argument("--weights", type=str, default=None,
                        help="npz weights path; defaults to "
                             "<model_dir>/newest_model.npz")
    parser.add_argument("--input_hw", type=str, default=None,
                        help="override model input as HxW (e.g. 240x320); "
                        "output grid scales by the family stride")
    parser.add_argument("--synthetic", action="store_true",
                        help="evaluate on the deterministic synthetic "
                             "multi-person benchmark (generated under "
                             "--dataset_path when missing; see ACCURACY.md)")
    parser.add_argument("--synthetic_seed", type=int, default=0)
    parser.add_argument("--synthetic_train_scenes", type=int, default=None,
                        help="match a dataset generated with this train-split "
                             "size (train.py --synthetic_train_scenes); any "
                             "existing dir with >= this many train scenes is "
                             "accepted as-is")
    parser.add_argument("--ppn_decoder", type=str, default=None,
                        help="PoseProposal decode-threshold overrides as "
                             "k=v[,k=v...] (e.g. thresh_part_score=0.1,"
                             "min_parts=3); see scripts/tune_ppn_decode.py")
    return parser.parse_args()


def parse_ppn_decoder(spec: str) -> dict:
    """Parse k=v[,k=v...] decode-threshold overrides, validating keys against
    PpnDecoderConfig fields and parsing numbers tolerantly (int then float,
    so negative ints stay ints)."""
    import dataclasses

    from hyperpose_tpu.ops.ppn_decode import PpnDecoderConfig

    valid = {f.name for f in dataclasses.fields(PpnDecoderConfig)}
    kv = {}
    for item in spec.split(","):
        if item.count("=") != 1:
            raise SystemExit(
                f"--ppn_decoder: bad token {item!r} (expected key=value)")
        k, v = (s.strip() for s in item.split("="))
        if k not in valid:
            raise SystemExit(
                f"--ppn_decoder: unknown key {k!r} "
                f"(valid: {', '.join(sorted(valid))})")
        try:
            kv[k] = int(v)
        except ValueError:
            try:
                kv[k] = float(v)
            except ValueError:
                raise SystemExit(
                    f"--ppn_decoder: non-numeric value {v!r} for {k!r}")
    return kv


def main():
    args = parse_args()
    Config.set_model_name(args.model_name)
    Config.set_model_type(Config.MODEL[args.model_type])
    Config.set_model_backbone(Config.BACKBONE[args.model_backbone])
    Config.set_dataset_type(Config.DATA[args.dataset_type])
    Config.set_dataset_version(args.dataset_version)
    if args.input_hw:
        hin, win = (int(v) for v in args.input_hw.lower().split("x"))
        # keep the family's hout/hin ratio (stride): read defaults first
        base = Config.get_config(create_dirs=False)
        stride_h = base.model.hin // base.model.hout
        stride_w = base.model.win // base.model.wout
        Config.set_model_inout(hin=hin, win=win, hout=hin // stride_h,
                               wout=win // stride_w)
    if args.synthetic:
        from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset

        kw = {}
        if args.synthetic_train_scenes:
            kw["n_train"] = args.synthetic_train_scenes
        args.dataset_path = ensure_synthetic_dataset(
            args.dataset_path, seed=args.synthetic_seed, **kw
        )
        if args.dataset_type == "MPII":
            # the MPII-format twin lives under <root>/mpii
            args.dataset_path = os.path.join(args.dataset_path, "mpii")
    Config.set_dataset_path(args.dataset_path)
    if args.ppn_decoder:
        Config.set_ppn_decoder(**parse_ppn_decoder(args.ppn_decoder))
    config = Config.get_config()
    config.eval.multiscale = args.multiscale

    import jax

    from hyperpose_tpu import models as Model
    from hyperpose_tpu.data.base import get_dataset
    from hyperpose_tpu.train.checkpoint import load_weights_npz

    model = Model.get_model(config)
    dataset = get_dataset(config)
    variables = model.init(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((1, config.model.hin, config.model.win, 3)),
        train=False,
    )
    weights = args.weights or os.path.join(
        config.model.model_dir, "newest_model.npz"
    )
    if os.path.exists(weights):
        variables = load_weights_npz(variables, weights)
        print(f"loaded weights from {weights}")
    else:
        print(f"WARNING: {weights} not found, evaluating random init")

    evaluate = Model.get_evaluate(config)
    metrics = evaluate(model, variables, dataset, limit=args.eval_num)
    print(metrics)


if __name__ == "__main__":
    main()
