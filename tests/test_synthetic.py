"""Synthetic benchmark generator: invariants + full-stack parse checks."""
import json
import os

import numpy as np
import pytest

from hyperpose_tpu.data.synthetic import generate_synthetic_coco


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_coco(root, n_train=8, n_val=5, seed=7)
    return root


def _load(root, split):
    path = os.path.join(
        root, "annotations", f"person_keypoints_{split}2017.json"
    )
    with open(path) as f:
        return json.load(f)


def test_deterministic(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    generate_synthetic_coco(a, n_train=3, n_val=2, seed=11)
    generate_synthetic_coco(b, n_train=3, n_val=2, seed=11)
    for split in ("train", "val"):
        assert _load(a, split) == _load(b, split)
    with open(os.path.join(a, "mpii", "mpii_annotations.json")) as f:
        ma = json.load(f)
    with open(os.path.join(b, "mpii", "mpii_annotations.json")) as f:
        mb = json.load(f)
    assert ma == mb


def test_annotation_invariants(synth_root):
    for split in ("train", "val"):
        data = _load(synth_root, split)
        sizes = {im["id"]: (im["height"], im["width"]) for im in data["images"]}
        assert len(data["images"]) > 0
        n_people = n_crowd = 0
        for ann in data["annotations"]:
            h, w = sizes[ann["image_id"]]
            k = np.array(ann["keypoints"]).reshape(17, 3)
            assert set(np.unique(k[:, 2])) <= {0.0, 1.0, 2.0}
            labeled = k[k[:, 2] > 0]
            # labeled keypoints are inside the frame
            assert (labeled[:, 0] >= 0).all() and (labeled[:, 0] < w).all()
            assert (labeled[:, 1] >= 0).all() and (labeled[:, 1] < h).all()
            assert ann["num_keypoints"] == int((k[:, 2] > 0).sum())
            x, y, bw, bh = ann["bbox"]
            assert bw > 0 and bh > 0 and ann["area"] > 0
            if ann["iscrowd"]:
                n_crowd += 1
                assert ann["num_keypoints"] == 0
                assert ann["segmentation"]
            else:
                n_people += 1
                assert ann["num_keypoints"] > 0
        assert n_people >= 2 * len(data["images"])  # multi-person scenes


def test_parses_through_coco_dataset(synth_root):
    from hyperpose_tpu import config as Config
    from hyperpose_tpu.data.base import get_dataset

    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_dataset_path(synth_root)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    recs = ds.get_train_records()
    assert len(recs) == 8
    for r in recs:
        assert os.path.exists(r.image_path)
        assert r.valid.any()
    assert len(ds.get_eval_records()) == 5


def test_gt_as_predictions_scores_perfect(synth_root):
    from hyperpose_tpu.eval.coco_eval import CocoKeypointEval

    val = _load(synth_root, "val")
    pds = [
        {"image_id": a["image_id"], "category_id": 1,
         "keypoints": a["keypoints"], "score": 1.0}
        for a in val["annotations"] if not a["iscrowd"]
    ]
    ev = CocoKeypointEval(os.path.join(
        synth_root, "annotations", "person_keypoints_val2017.json"
    ))
    res = ev.evaluate(pds, verbose=False)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AR"] == pytest.approx(1.0)


def test_mpii_twin_gt_scores_perfect(synth_root):
    from hyperpose_tpu.eval.mpii_eval import pckh_eval

    with open(os.path.join(synth_root, "mpii", "mpii_annotations.json")) as f:
        entries = json.load(f)
    assert entries
    gt, preds = {}, []
    for i, entry in enumerate(entries):
        kpts = np.array([p["joints"] for p in entry["people"]], np.float64)
        boxes = np.array([
            p["headbox"] for p in entry["people"]
        ], np.float64)
        gt[i] = (kpts, boxes)
        for p in entry["people"]:
            j = np.array(p["joints"])
            j[:, 2] = 1.0
            preds.append({
                "image_id": i, "keypoints": j.reshape(-1).tolist(),
                "score": 1.0,
            })
        img = os.path.join(synth_root, "mpii", "images", entry["image"])
        assert os.path.exists(img)
    res = pckh_eval(preds, gt)
    # >= 100 due to the reference numerator quirk (invisible-joint hits)
    assert res["Mean"] >= 99.9


def test_val_split_invariant_to_train_size(tmp_path):
    """Enlarging the train split (train.py --synthetic_train_scenes) must
    keep the val split byte-identical: per-scene seeding offsets val by
    10**6, so n_train never touches val rngs or ids."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_synthetic_coco(a, n_train=3, n_val=2, seed=5)
    generate_synthetic_coco(b, n_train=9, n_val=2, seed=5)

    def val_ann(root):
        with open(os.path.join(
            root, "annotations", "person_keypoints_val2017.json"
        )) as f:
            return json.load(f)

    assert val_ann(a) == val_ann(b)
    for fname in sorted(os.listdir(os.path.join(a, "val2017"))):
        with open(os.path.join(a, "val2017", fname), "rb") as fa, \
             open(os.path.join(b, "val2017", fname), "rb") as fb:
            assert fa.read() == fb.read(), f"val image {fname} differs"
    # and the enlarged train split really is bigger, with the original
    # scenes as a prefix
    ta = sorted(os.listdir(os.path.join(a, "train2017")))
    tb = sorted(os.listdir(os.path.join(b, "train2017")))
    assert len(tb) == 9 and ta == tb[:3]


def test_ensure_accepts_superset_and_train_start(tmp_path):
    """1) ensure_synthetic_dataset must NOT regenerate (clobbering user
    data) when the existing dir has >= the requested train scenes (r4
    advisor finding: eval.py silently rewrote a --synthetic_train_scenes
    1600 dir back to 400). 2) generate_synthetic_coco(train_start=k)
    renders exactly the scenes a longer split would have continued with
    (the held-out tune split of scripts/tune_ppn_decode.py)."""
    from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset

    root = str(tmp_path / "ds")
    ensure_synthetic_dataset(root, seed=5, n_train=6, n_val=2)
    marker = os.path.join(root, ".synthetic_meta.json")
    before = os.path.getmtime(marker)
    with open(marker) as f:
        meta_before = json.load(f)

    # smaller request: accepted as-is, nothing rewritten
    out = ensure_synthetic_dataset(root, seed=5, n_train=3, n_val=2)
    assert out == root
    assert os.path.getmtime(marker) == before
    with open(marker) as f:
        assert json.load(f) == meta_before
    assert len(os.listdir(os.path.join(root, "train2017"))) == 6

    # different seed or larger n_train: regenerates
    ensure_synthetic_dataset(root, seed=5, n_train=8, n_val=2)
    assert len(os.listdir(os.path.join(root, "train2017"))) == 8

    # train_start renders the continuation scenes byte-identically
    tail = str(tmp_path / "tail")
    generate_synthetic_coco(tail, n_train=3, n_val=0, seed=5,
                            emit_mpii=False, train_start=5)
    full = sorted(os.listdir(os.path.join(root, "train2017")))
    got = sorted(os.listdir(os.path.join(tail, "train2017")))
    assert got == full[5:8]
    for fname in got:
        with open(os.path.join(root, "train2017", fname), "rb") as fa, \
             open(os.path.join(tail, "train2017", fname), "rb") as fb:
            assert fa.read() == fb.read(), f"tail scene {fname} differs"
