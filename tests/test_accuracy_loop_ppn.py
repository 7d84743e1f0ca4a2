"""Reduced-scale regression of the PoseProposal accuracy loop (ACCURACY.md).

gt-painted PPN grid targets through the REAL eval chain — CocoPoseDataset
parsing (PPN 18-part layout incl. Instance anchor), Evaluator batching,
restore_coor, on-device PPN decode (golden-tested), converters, validated
COCOeval — bounding what any trained PPN can score through the 12x12 grid
representation. Full-scale twin: scripts/eval_ppn_ceiling.py.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.mscoco import PPN_FROM_COCO17, coco17_to_model
from hyperpose_tpu.data.synthetic import generate_synthetic_coco
from hyperpose_tpu.models import get_topology

from gt_painted_ppn import GtPaintedPpnEvaluator, paint_ppn_batches

IN_HW = (384, 384)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("acc_ppn"))
    generate_synthetic_coco(
        root, n_train=2, n_val=6, seed=17, sizes=(IN_HW,), emit_mpii=False
    )
    return root


def test_gt_painted_ppn_eval_scores_high(synth):
    Config.reset()
    Config.set_model_type(Config.MODEL.PoseProposal)
    Config.set_dataset_path(synth)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)
    assert cfg.model.n_pos == 18

    with open(os.path.join(
        synth, "annotations", "person_keypoints_val2017.json"
    )) as f:
        val = json.load(f)
    anns_by_img = {}
    img_hw = {im["id"]: (im["height"], im["width"]) for im in val["images"]}
    for a in val["annotations"]:
        if not a["iscrowd"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)

    records = ds.get_eval_records()
    assert len(records) == 6
    batch_size = 2
    max_people = max(len(v) for v in anns_by_img.values())

    def people_of_record(rec):
        oh, ow = img_hw[rec.image_id]
        sx, sy = IN_HW[1] / ow, IN_HW[0] / oh
        out = []
        for ann in anns_by_img.get(rec.image_id, []):
            k3 = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
            k17 = k3[:, :2] * (sx, sy)
            bb = np.asarray(ann["bbox"], np.float32) * (sx, sy, sx, sy)
            kp, v = coco17_to_model(
                k17, k3[:, 2] > 0, PPN_FROM_COCO17, cfg.model.n_pos, bbox=bb
            )
            out.append((kp, v, bb))
        return out

    ev = GtPaintedPpnEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(paint_ppn_batches(
        records, people_of_record, cfg, topo, batch_size, max_people
    ))
    res = ev.evaluate(records=records, eval_dir="/tmp/ppn_ceiling_ci")
    # The 12x12 grid (32 px cells) + one-person-per-cell collisions cap the
    # ceiling well below the PAF family's; a regression anywhere in the PPN
    # eval stack drops it further.
    assert res["AP"] > 0.35, res
    assert res["AR"] > 0.40, res
