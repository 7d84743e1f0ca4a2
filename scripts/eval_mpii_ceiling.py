#!/usr/bin/env python
"""Full-scale MPII PCKh gt-painted ceiling (ACCURACY.md row).

Runs the synthetic MPII twin's full val split through the REAL eval path
(MpiiPoseDataset parsing -> Evaluator batching -> 2x-upsampled decode with
the MPII topology -> native-order converter -> protocol-exact PCKh scorer)
with ground-truth-painted target maps: the score bounds what ANY model can
reach on this benchmark through the stride-8 target representation, and
exercises every line of the MPII eval stack
(reference: hyperpose/Dataset/mpii_dataset/dataset.py:102-236).

CPU-friendly (forced-CPU like tests/conftest.py); ~100 scenes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset
from hyperpose_tpu.models import get_topology
from gt_painted import GtPaintedEvaluator, paint_batches

IN_HW = (368, 432)
FEAT_HW = (46, 54)


def main():
    root = ensure_synthetic_dataset(
        os.environ.get("SYNTH_ROOT", "/tmp/data_synth"), seed=0
    )
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    Config.set_dataset_type(Config.DATA.MPII)
    Config.set_dataset_path(os.path.join(root, "mpii"))
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)

    entries = ds._eval_entries()
    records = ds.get_eval_records()
    print(f"MPII twin: {len(records)} val scenes")

    import cv2

    def kpts_of_record(rec):
        # Paint targets in the 368x432 eval frame: scale native joints from
        # original image pixels (scenes come in mixed sizes) exactly like
        # Evaluator's cv2.resize of the input image.
        oh, ow = cv2.imread(rec.image_path).shape[:2]
        sx, sy = IN_HW[1] / ow, IN_HW[0] / oh
        out = []
        for p in entries[rec.image_id]["people"]:
            joints = np.asarray(p["joints"], np.float32).copy()
            joints[:, 0] *= sx
            joints[:, 1] *= sy
            out.append(ds._native_to_model(joints))
        return out

    max_people = max(len(e["people"]) for e in entries)
    batch_size = 8
    ev = GtPaintedEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(paint_batches(
        records, kpts_of_record, cfg.model.n_pos, topo.limbs,
        IN_HW, FEAT_HW, batch_size, max_people,
    ))
    res = ev.evaluate(records=records, eval_dir="/tmp/mpii_ceiling_eval")
    print(json.dumps({k: round(v, 3) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
