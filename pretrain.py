#!/usr/bin/env python
"""Backbone ImageNet pretraining entry (reference: pretrain.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu import config as Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_backbone", type=str, default="Vggtiny",
                   choices=[b.name for b in Config.BACKBONE if b.name != "Default"])
    p.add_argument("--pretrain_dataset_path", type=str,
                   default="./data/imagenet")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--n_step", type=int, default=None)
    p.add_argument("--lr_init", type=float, default=None)
    p.add_argument("--lr_decay_step", type=int, default=None)
    p.add_argument("--val_interval", type=int, default=None)
    p.add_argument("--log_interval", type=int, default=None)
    p.add_argument("--save_interval", type=int, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="pretrain on the deterministic synthetic shape/color "
                        "classification twin (generated under "
                        "--pretrain_dataset_path when missing)")
    p.add_argument("--synthetic_seed", type=int, default=0)
    p.add_argument("--image_size", type=int, default=None,
                   help="train/val crop size (default: 96 with --synthetic, "
                        "else 224 like the reference)")
    args = p.parse_args()
    image_size = args.image_size or (96 if args.synthetic else 224)

    if args.synthetic:
        from hyperpose_tpu.data.synthetic import ensure_synthetic_imagenet

        args.pretrain_dataset_path = ensure_synthetic_imagenet(
            args.pretrain_dataset_path
            if args.pretrain_dataset_path != "./data/imagenet"
            else "./data_synth_imagenet",
            seed=args.synthetic_seed,
        )

    Config.set_pretrain(True)
    Config.set_pretrain_dataset_path(args.pretrain_dataset_path)
    for k in ("batch_size", "lr_init", "lr_decay_step", "val_interval",
              "log_interval", "save_interval"):
        v = getattr(args, k)
        if v is not None:
            Config._set("pretrain", k, v)
    config = Config.get_config()

    from hyperpose_tpu.models.backbones import BACKBONES
    from hyperpose_tpu.train.pretrain import (
        load_imagenet_splits, single_pretrain,
    )

    backbone_cls = BACKBONES[args.model_backbone]
    train_ds, val_ds = load_imagenet_splits(
        config.pretrain.pretrain_dataset_path, image_size=image_size
    )
    _, _, history = single_pretrain(
        backbone_cls, config, dataset=train_ds, val_dataset=val_ds,
        n_step=args.n_step,
    )
    if history["log"]:
        first, last = history["log"][0], history["log"][-1]
        print(f"pretrain: loss {first['loss']:.3f} -> {last['loss']:.3f}, "
              f"top1 {first['top1']:.3f} -> {last['top1']:.3f}")
    if history["val"]:
        print(f"final val: {history['val'][-1]}")
    print(f"lr events: {history['lr_events']}")


if __name__ == "__main__":
    main()
