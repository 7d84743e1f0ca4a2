#!/usr/bin/env python
"""Full-scale OpenPose-family gt-painted ceiling (ACCURACY.md rows).

Runs the synthetic benchmark's full val split through the REAL conf/PAF
eval chain (CocoPoseDataset -> Evaluator batching -> gt-painted
data.targets.openpose_targets fed back as perfect predictions -> 2x
cubic-upsampled on-device PAF decode -> validated COCOeval). Bounds what
ANY conf/PAF model (full 6-stage OpenPose, LW-OpenPose, Thin, Small —
they share the target representation, reference:
hyperpose/Model/openpose/utils.py:55-216) can score through the stride-8
targets at the given input resolution. CPU-friendly.

  OPPS_HW=272x320 python scripts/eval_openpose_ceiling.py   # reduced res
  python scripts/eval_openpose_ceiling.py                   # 368x432

See tests/test_accuracy_loop.py for the reduced-scale CI twin.
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

import jax.numpy as jnp

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.mscoco import OPPS_FROM_COCO17, coco17_to_model
from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset
from hyperpose_tpu.data.targets import openpose_targets
from hyperpose_tpu.data.synthetic import DEFAULT_N_VAL  # noqa: F401
from hyperpose_tpu.models import get_topology

from gt_painted import GtPaintedEvaluator

IN_HW = (368, 432)
if os.environ.get("OPPS_HW"):
    IN_HW = tuple(int(v) for v in os.environ["OPPS_HW"].lower().split("x"))
FEAT_HW = (IN_HW[0] // 8, IN_HW[1] // 8)


def main():
    root = ensure_synthetic_dataset(
        os.environ.get("SYNTH_ROOT", "./data_synth"), seed=0
    )
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    Config.set_model_inout(hin=IN_HW[0], win=IN_HW[1],
                           hout=FEAT_HW[0], wout=FEAT_HW[1])
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
    print(f"synthetic val: {len(records)} scenes, in_hw={IN_HW}")
    batch_size = 4
    max_people = max(len(v) for v in anns_by_img.values())

    batches = []
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        kpts = np.full((batch_size, max_people, cfg.model.n_pos, 2),
                       -1000.0, np.float32)
        valid = np.zeros((batch_size, max_people, cfg.model.n_pos), bool)
        for j, rec in enumerate(chunk):
            # mixed-size scenes: paint in the eval frame like the resized
            # input image
            oh, ow = img_hw[rec.image_id]
            sx, sy = IN_HW[1] / ow, IN_HW[0] / oh
            for m, ann in enumerate(anns_by_img.get(rec.image_id, [])):
                k3 = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
                kv, vv = coco17_to_model(
                    k3[:, :2] * (sx, sy), k3[:, 2] > 0, OPPS_FROM_COCO17,
                    cfg.model.n_pos,
                )
                kpts[j, m] = kv
                valid[j, m] = vv
        t = openpose_targets(
            jnp.asarray(kpts), jnp.asarray(valid), topo.limbs,
            IN_HW, FEAT_HW,
        )
        batches.append((
            jnp.asarray(t["conf_map"], jnp.float32),
            jnp.asarray(t["paf_map"], jnp.float32),
        ))

    ev = GtPaintedEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(batches)
    res = ev.evaluate(records=records, eval_dir="/tmp/opps_ceiling_eval")
    print(json.dumps({k: round(float(v), 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()


