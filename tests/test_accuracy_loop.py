"""Reduced-scale regression of the offline accuracy loop (see ACCURACY.md).

The full loop — synthetic COCO generation -> CocoPoseDataset parsing ->
Evaluator batching -> on-device decode -> keypoint converters ->
validated COCOeval — runs here end to end with the model forward replaced
by ground-truth-painted target maps (data.targets.openpose_targets, whose
decode-consistency is covered by tests/test_learning.py). Training itself
is exercised at full scale on the TPU (eval.py --synthetic; numbers in
ACCURACY.md) and at toy scale by test_learning; CI machines are too slow
to train 368x432 models.

A gt-painted run must score near-perfect mAP: anything below the threshold
means a regression somewhere in records parsing, batching, decode, the
opps<->coco17 converters, or the scorer.
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.mscoco import OPPS_FROM_COCO17, coco17_to_model
from hyperpose_tpu.data.synthetic import generate_synthetic_coco
from hyperpose_tpu.data.targets import openpose_targets
from hyperpose_tpu.models import get_topology

from gt_painted import GtPaintedEvaluator

IN_HW = (368, 432)
FEAT_HW = (46, 54)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("acc"))
    generate_synthetic_coco(
        root, n_train=2, n_val=8, seed=5, sizes=(IN_HW,), emit_mpii=False
    )
    return root


def test_gt_painted_eval_scores_high(synth):
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    Config.set_dataset_path(synth)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)

    with open(os.path.join(
        synth, "annotations", "person_keypoints_val2017.json"
    )) as f:
        val = json.load(f)
    anns_by_img = {}
    for a in val["annotations"]:
        if not a["iscrowd"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)

    records = ds.get_eval_records()
    assert len(records) == 8
    batch_size = 4
    max_people = max(len(v) for v in anns_by_img.values())

    batches = []
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        kpts = np.full((batch_size, max_people, cfg.model.n_pos, 2),
                       -1000.0, np.float32)
        valid = np.zeros((batch_size, max_people, cfg.model.n_pos), bool)
        for j, rec in enumerate(chunk):
            for m, ann in enumerate(anns_by_img.get(rec.image_id, [])):
                k3 = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
                kv, vv = coco17_to_model(
                    k3[:, :2], k3[:, 2] > 0, OPPS_FROM_COCO17,
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
    res = ev.evaluate(records=records, eval_dir="/tmp/acc_eval")
    # gt-painted maps through the 2x-upsampled eval decode: residual loss
    # comes from stride-8 target quantization on the smallest figures
    # (facial keypoints < 1 cell apart cannot be separated even at 2x)
    assert res["AP"] > 0.70, res
    assert res["AR"] > 0.72, res
