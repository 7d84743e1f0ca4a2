#!/usr/bin/env python
"""Full-scale PifPaf gt-painted ceiling (ACCURACY.md row).

Runs the synthetic benchmark's full val split through the REAL PifPaf eval
chain (CocoPoseDataset -> Evaluator batching -> CIF/CAF painting fed back
as perfect raw predictions -> full on-device PifPaf decode -> validated
COCOeval). Bounds what any trained PifPaf can score through the stride-8
field representation. CPU-friendly. See tests/test_accuracy_loop_pifpaf.py
for the reduced-scale CI twin.
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset
from hyperpose_tpu.models import get_topology
import test_accuracy_loop_pifpaf as _T

# PIFPAF_HW=240x320 overrides the eval resolution (the decoder is
# resolution-generic; used for the reduced-res trained-row denominator).
if os.environ.get("PIFPAF_HW"):
    _h, _w = (int(v) for v in os.environ["PIFPAF_HW"].lower().split("x"))
    _T.IN_HW = (_h, _w)
    _T.FEAT_HW = (_h // 8, _w // 8)
IN_HW = _T.IN_HW
GtPaintedPifPafEvaluator = _T.GtPaintedPifPafEvaluator
paint_raw_predict = _T.paint_raw_predict


def main():
    root = ensure_synthetic_dataset(
        os.environ.get("SYNTH_ROOT", "/tmp/data_synth"), seed=0
    )
    Config.reset()
    Config.set_model_type(Config.MODEL.Pifpaf)
    Config.set_dataset_path(root)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)

    with open(os.path.join(
        root, "annotations", "person_keypoints_val2017.json"
    )) as f:
        val = json.load(f)
    anns_by_img = {}
    img_hw = {im["id"]: (im["height"], im["width"]) for im in val["images"]}
    for a in val["annotations"]:
        if not a["iscrowd"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)

    records = ds.get_eval_records()
    print(f"synthetic val: {len(records)} scenes")
    batch_size = 4
    max_people = max(len(v) for v in anns_by_img.values())

    batches = []
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        kpts = np.full((batch_size, max_people, 17, 2), -1000.0, np.float32)
        valid = np.zeros((batch_size, max_people, 17), bool)
        for j, rec in enumerate(chunk):
            # mixed-size scenes: paint in the eval frame like the resized
            # input image
            oh, ow = img_hw[rec.image_id]
            sx, sy = IN_HW[1] / ow, IN_HW[0] / oh
            for m, ann in enumerate(anns_by_img.get(rec.image_id, [])):
                k3 = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
                kpts[j, m] = k3[:, :2] * (sx, sy)
                valid[j, m] = k3[:, 2] > 0
        batches.append(paint_raw_predict(kpts, valid, topo.limbs))

    ev = GtPaintedPifPafEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(batches, topo)
    res = ev.evaluate(records=records, eval_dir="/tmp/pifpaf_ceiling_eval")
    print(json.dumps({k: round(float(v), 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
