#!/usr/bin/env python
"""Full-scale PoseProposal gt-painted ceilings (ACCURACY.md rows).

Runs the synthetic benchmark's full val split through the REAL PPN eval
chain (dataset parsing -> Evaluator batching -> grid targets painted from
gt fed back as perfect predictions -> restore_coor -> golden-tested
on-device PPN decode -> validated scorer). Bounds what ANY trained PPN can
score through the 12x12 grid representation — the denominator for the
trained PPN rows. CPU-friendly.

    python scripts/eval_ppn_ceiling.py          # COCO-synthetic OKS mAP
    python scripts/eval_ppn_ceiling.py mpii     # MPII-twin PCKh

Reduced-scale CI twin: tests/test_accuracy_loop_ppn.py.
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
from hyperpose_tpu.data.base import derive_bbxs, get_dataset
from hyperpose_tpu.data.mscoco import PPN_FROM_COCO17, coco17_to_model
from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset
from hyperpose_tpu.models import get_topology

from gt_painted_ppn import GtPaintedPpnEvaluator, paint_ppn_batches

IN_HW = (384, 384)


def main():
    protocol = sys.argv[1] if len(sys.argv) > 1 else "coco"
    root = ensure_synthetic_dataset(
        os.environ.get("SYNTH_ROOT", "/tmp/data_synth"), seed=0
    )
    Config.reset()
    Config.set_model_type(Config.MODEL.PoseProposal)
    if protocol == "mpii":
        Config.set_dataset_type(Config.DATA.MPII)
        Config.set_dataset_path(os.path.join(root, "mpii"))
    else:
        Config.set_dataset_path(root)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)
    records = ds.get_eval_records()
    print(f"{protocol}: {len(records)} val scenes, K={cfg.model.n_pos}")

    import cv2

    if protocol == "mpii":
        entries = ds._eval_entries()

        def people_of_record(rec):
            oh, ow = cv2.imread(rec.image_path).shape[:2]
            sx, sy = IN_HW[1] / ow, IN_HW[0] / oh
            out = []
            for p in entries[rec.image_id]["people"]:
                joints = np.asarray(p["joints"], np.float32).copy()
                joints[:, 0] *= sx
                joints[:, 1] *= sy
                kp, v = ds._native_to_model(joints)
                kp, v = kp[: cfg.model.n_pos], v[: cfg.model.n_pos]
                bb = derive_bbxs(kp[None], v[None])[0]
                out.append((kp, v, bb))
            return out

        max_people = max(len(e["people"]) for e in entries.values()) \
            if hasattr(entries, "values") else \
            max(len(e["people"]) for e in entries)
    else:
        with open(os.path.join(
            root, "annotations", "person_keypoints_val2017.json"
        )) as f:
            val = json.load(f)
        anns_by_img = {}
        img_hw = {im["id"]: (im["height"], im["width"])
                  for im in val["images"]}
        for a in val["annotations"]:
            if not a["iscrowd"]:
                anns_by_img.setdefault(a["image_id"], []).append(a)

        def people_of_record(rec):
            oh, ow = img_hw[rec.image_id]
            sx, sy = IN_HW[1] / ow, IN_HW[0] / oh
            out = []
            for ann in anns_by_img.get(rec.image_id, []):
                k3 = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
                k17 = k3[:, :2] * (sx, sy)
                bb = np.asarray(ann["bbox"], np.float32) * (sx, sy, sx, sy)
                kp, v = coco17_to_model(
                    k17, k3[:, 2] > 0, PPN_FROM_COCO17, cfg.model.n_pos,
                    bbox=bb,
                )
                out.append((kp, v, bb))
            return out

        max_people = max(len(v) for v in anns_by_img.values())

    batch_size = 8
    ev = GtPaintedPpnEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(paint_ppn_batches(
        records, people_of_record, cfg, topo, batch_size, max_people
    ))
    res = ev.evaluate(records=records,
                      eval_dir=f"/tmp/ppn_ceiling_{protocol}")
    print(json.dumps({k: round(float(v), 3) for k, v in res.items()},
                     indent=1))


if __name__ == "__main__":
    main()
