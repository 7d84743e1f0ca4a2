#!/usr/bin/env python
"""Convert a reference TensorLayer npz_dict checkpoint to our weight format.

Usage:
  python scripts/convert_reference_npz.py --model LightweightOpenpose \
      --backbone Vggtiny --src newest_model.npz --dst converted.npz
  python scripts/convert_reference_npz.py ... --report   # alignment only

(reference: Model/train.py:319 save_weights(format='npz_dict') produces the
source files; the model-zoo .npz checkpoints in the reference README use
this format.)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="LightweightOpenpose")
    ap.add_argument("--backbone", default="Default")
    ap.add_argument("--src", required=True, help="reference npz_dict file")
    ap.add_argument("--dst", default=None, help="output weights file")
    ap.add_argument("--report", action="store_true",
                    help="print the alignment report and exit")
    ap.add_argument("--lenient", action="store_true",
                    help="import what aligns, skip the rest")
    args = ap.parse_args()

    from hyperpose_tpu import Config, Model
    from hyperpose_tpu.train.checkpoint import save_weights_npz
    from hyperpose_tpu.utils.tl_orders import ORDER_KEYS
    from hyperpose_tpu.utils.weights_import import (
        compare_report, import_npz_dict, import_tl_checkpoint,
    )

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
    report = compare_report(variables, args.src)
    print(json.dumps(report, indent=2))
    if args.report:
        return
    order_key = ORDER_KEYS.get(args.model)
    if order_key is not None:
        # exact structural import (layer-sequence + bias folding)
        variables = import_tl_checkpoint(variables, args.src, order_key)
    else:
        variables = import_npz_dict(
            variables, args.src, strict=not args.lenient
        )
    dst = args.dst or args.src.replace(".npz", "_converted.npz")
    save_weights_npz(variables, dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
