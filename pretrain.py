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
    args = p.parse_args()

    Config.set_pretrain(True)
    Config.set_pretrain_dataset_path(args.pretrain_dataset_path)
    if args.batch_size:
        Config._set("pretrain", "batch_size", args.batch_size)
    config = Config.get_config()

    from hyperpose_tpu.models.backbones import BACKBONES
    from hyperpose_tpu.train.pretrain import single_pretrain

    backbone_cls = BACKBONES[args.model_backbone]
    single_pretrain(backbone_cls, config, n_step=args.n_step)


if __name__ == "__main__":
    main()
