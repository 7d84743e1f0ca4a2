"""Reduced-scale regression of the PifPaf accuracy loop (ACCURACY.md).

Third member of the gt-painted family (tests/test_accuracy_loop.py: COCO
PAF; tests/test_accuracy_loop_mpii.py: MPII PCKh): the full PifPaf eval
chain — synthetic COCO generation -> CocoPoseDataset parsing (identity
COCO17 layout) -> Evaluator batching -> CIF/CAF target painting fed back
as perfect raw predictions -> the full on-device PifPaf decode (seeds,
frontier growth, NMS; golden-tested in tests/test_pifpaf_golden.py) ->
COCO17 converter -> fixture-validated COCOeval — runs end to end without
training. Bounds what any trained PifPaf can score through the stride-8
field representation and catches regressions anywhere in that chain.
"""
import json
import os

import numpy as np
import pytest

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.synthetic import generate_synthetic_coco
from hyperpose_tpu.data.targets import pifpaf_targets
from hyperpose_tpu.eval.evaluate import Evaluator
from hyperpose_tpu.models import get_topology
from hyperpose_tpu.ops.pifpaf_decode import (
    PifPafDecoderConfig, pifpaf_decode_batch,
)
from hyperpose_tpu.utils.human import SkeletonBatch

IN_HW = (368, 432)
FEAT_HW = (46, 54)
STRIDE = 8


def inv_softplus(y):
    return np.log(np.expm1(np.maximum(y, 1e-6)))


def paint_raw_predict(kpts, valid, bones):
    """gt keypoints -> CIF/CAF targets -> perfect raw (pre-activation)
    model outputs, mirroring tests/test_pifpaf.py roundtrip."""
    t = pifpaf_targets(kpts, valid, bones, IN_HW, FEAT_HW)

    def to_logit(conf):
        c = np.nan_to_num(np.asarray(conf), nan=0.0)
        return np.where(c > 0.5, 8.0, -10.0).astype(np.float32)

    def raw_vec(v):
        return np.nan_to_num(np.asarray(v), nan=0.0).astype(np.float32)

    def raw_scale(s):
        s = np.nan_to_num(np.asarray(s), nan=1.0)
        return inv_softplus(np.maximum(s, 0.2)).astype(np.float32)

    return {
        "pif_conf": to_logit(t["pif_conf"]),
        "pif_vec": raw_vec(t["pif_vec"]),
        "pif_bmin": np.zeros_like(to_logit(t["pif_conf"])),
        "pif_scale": raw_scale(t["pif_scale"]),
        "paf_conf": to_logit(t["paf_conf"]),
        "paf_src_vec": raw_vec(t["paf_src_vec"]),
        "paf_dst_vec": raw_vec(t["paf_dst_vec"]),
        "paf_src_bmin": np.zeros_like(to_logit(t["paf_conf"])),
        "paf_dst_bmin": np.zeros_like(to_logit(t["paf_conf"])),
        "paf_src_scale": raw_scale(t["paf_src_scale"]),
        "paf_dst_scale": raw_scale(t["paf_dst_scale"]),
    }


class GtPaintedPifPafEvaluator(Evaluator):
    def set_batches(self, batches, topo):
        self._raw = list(batches)
        self._cursor = 0
        self._topo = topo

    def infer_batch(self, images_u8):
        predict = self._raw[self._cursor]
        self._cursor += 1
        out = pifpaf_decode_batch(
            predict, PifPafDecoderConfig(), STRIDE, IN_HW, self._topo,
        )
        return SkeletonBatch(*(np.asarray(x) for x in (
            out.coords, out.part_scores, out.part_valid, out.scores,
            out.valid,
        )))


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("acc_pp"))
    generate_synthetic_coco(
        root, n_train=2, n_val=6, seed=13, sizes=(IN_HW,), emit_mpii=False
    )
    return root


def test_gt_painted_pifpaf_eval_scores_high(synth):
    Config.reset()
    Config.set_model_type(Config.MODEL.Pifpaf)
    Config.set_dataset_path(synth)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)
    assert topo.n_parts == 17

    with open(os.path.join(
        synth, "annotations", "person_keypoints_val2017.json"
    )) as f:
        val = json.load(f)
    anns_by_img = {}
    for a in val["annotations"]:
        if not a["iscrowd"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)

    records = ds.get_eval_records()
    assert len(records) == 6
    batch_size = 2
    max_people = max(len(v) for v in anns_by_img.values())

    batches = []
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        kpts = np.full((batch_size, max_people, 17, 2), -1000.0, np.float32)
        valid = np.zeros((batch_size, max_people, 17), bool)
        for j, rec in enumerate(chunk):
            for m, ann in enumerate(anns_by_img.get(rec.image_id, [])):
                k3 = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
                kpts[j, m] = k3[:, :2]
                valid[j, m] = k3[:, 2] > 0
        batches.append(paint_raw_predict(kpts, valid, topo.limbs))

    ev = GtPaintedPifPafEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(batches, topo)
    res = ev.evaluate(records=records, eval_dir="/tmp/acc_eval_pifpaf")
    # Ceiling: residual loss is stride-8 field quantization + seed/NMS
    # merging of the smallest figures' facial keypoints.
    assert res["AP"] > 0.55, res
    assert res["AR"] > 0.60, res
