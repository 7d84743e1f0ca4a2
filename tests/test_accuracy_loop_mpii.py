"""Reduced-scale regression of the MPII PCKh accuracy loop (ACCURACY.md).

Mirror of tests/test_accuracy_loop.py on the synthetic MPII twin: the full
chain — synthetic MPII generation -> MpiiPoseDataset parsing (native->model
joint layout incl. the synthesized Center row) -> Evaluator batching ->
on-device decode (MPII topology) -> native-order output converter -> the
protocol-exact PCKh scorer (eval/mpii_eval.py, reference:
mpii_dataset/dataset.py:102-236) — runs end to end with gt-painted target
maps. A regression anywhere in the MPII path drops the score.
"""
import numpy as np
import pytest

from hyperpose_tpu import config as Config
from hyperpose_tpu.data.base import get_dataset
from hyperpose_tpu.data.synthetic import generate_synthetic_coco
from hyperpose_tpu.models import get_topology

from gt_painted import GtPaintedEvaluator, paint_batches

IN_HW = (368, 432)
FEAT_HW = (46, 54)


@pytest.fixture(scope="module")
def synth_mpii(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("acc_mpii"))
    generate_synthetic_coco(
        root, n_train=2, n_val=8, seed=11, sizes=(IN_HW,), emit_mpii=True
    )
    return root + "/mpii"


def test_gt_painted_mpii_pckh_scores_high(synth_mpii):
    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.Vggtiny)
    Config.set_dataset_type(Config.DATA.MPII)
    Config.set_dataset_path(synth_mpii)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    topo = get_topology(cfg)
    assert cfg.model.n_pos == 16  # 15 MPII parts + background

    entries = ds._eval_entries()
    records = ds.get_eval_records()
    assert len(records) == 8

    def kpts_of_record(rec):
        people = entries[rec.image_id]["people"]
        return [
            ds._native_to_model(np.asarray(p["joints"], np.float32))
            for p in people
        ]

    max_people = max(len(e["people"]) for e in entries)
    batch_size = 4
    ev = GtPaintedEvaluator(
        model=None, variables=None, dataset=ds, input_hw=IN_HW,
        output_converter=ds.output_converter, topology=topo,
        batch_size=batch_size,
    )
    ev.set_batches(paint_batches(
        records, kpts_of_record, cfg.model.n_pos, topo.limbs,
        IN_HW, FEAT_HW, batch_size, max_people,
    ))
    res = ev.evaluate(records=records, eval_dir="/tmp/acc_eval_mpii")
    # gt-painted ceiling: residual loss is stride-8 target quantization on
    # the smallest figures; PCKh@0.5's half-headbox-diagonal tolerance
    # absorbs most of it.
    assert res["PCKh"] > 0.80, res
    assert res["Head"] > 75.0, res
