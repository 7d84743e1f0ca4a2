"""OKS evaluator correctness on synthetic ground truth."""
import json

import numpy as np
import pytest

from hyperpose_tpu.eval.coco_eval import CocoKeypointEval, compute_oks


def make_gt(tmp_path, n_imgs=3, people_per_img=2, seed=0):
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        images.append({"id": img_id, "width": 640, "height": 480,
                       "file_name": f"{img_id}.jpg"})
        for _ in range(people_per_img):
            cx, cy = rng.uniform(100, 500), rng.uniform(100, 380)
            kpts = []
            for _ in range(17):
                kpts += [float(cx + rng.uniform(-40, 40)),
                         float(cy + rng.uniform(-60, 60)), 2]
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kpts, "num_keypoints": 17,
                "area": 150 * 150.0, "bbox": [cx - 75, cy - 75, 150, 150],
                "iscrowd": 0,
            })
            ann_id += 1
    path = tmp_path / "gt.json"
    path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }))
    return str(path), annotations


def test_oks_identity():
    kpts = np.tile([100.0, 100.0, 2.0], 17)
    assert compute_oks(kpts, kpts, 100.0) == pytest.approx(1.0)


def test_perfect_predictions_ap1(tmp_path):
    gt_path, gts = make_gt(tmp_path)
    preds = [
        {"image_id": g["image_id"], "category_id": 1,
         "keypoints": list(g["keypoints"]), "score": 0.9}
        for g in gts
    ]
    ev = CocoKeypointEval(gt_path)
    res = ev.evaluate(preds, verbose=False)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AR"] == pytest.approx(1.0)


def test_noisy_predictions_lower_ap(tmp_path):
    gt_path, gts = make_gt(tmp_path)
    rng = np.random.default_rng(1)
    preds = []
    for g in gts:
        k = np.asarray(g["keypoints"], float).reshape(17, 3)
        k[:, :2] += rng.normal(0, 25, (17, 2))
        preds.append({
            "image_id": g["image_id"], "category_id": 1,
            "keypoints": k.reshape(-1).tolist(), "score": 0.9,
        })
    ev = CocoKeypointEval(gt_path)
    res = ev.evaluate(preds, verbose=False)
    assert 0.0 < res["AP"] < 1.0


def test_missing_detections_hurt_recall(tmp_path):
    gt_path, gts = make_gt(tmp_path)
    preds = [
        {"image_id": g["image_id"], "category_id": 1,
         "keypoints": list(g["keypoints"]), "score": 0.9}
        for g in gts[::2]  # half the people
    ]
    ev = CocoKeypointEval(gt_path)
    res = ev.evaluate(preds, verbose=False)
    assert res["AR"] < 0.75
    assert res["AP"] < 0.75


def test_false_positives_hurt_precision(tmp_path):
    gt_path, gts = make_gt(tmp_path)
    preds = [
        {"image_id": g["image_id"], "category_id": 1,
         "keypoints": list(g["keypoints"]), "score": 0.5}
        for g in gts
    ]
    rng = np.random.default_rng(2)
    for g in gts:
        junk = rng.uniform(0, 50, 51)
        junk[2::3] = 1
        preds.append({
            "image_id": g["image_id"], "category_id": 1,
            "keypoints": junk.tolist(), "score": 0.9,  # junk scored HIGHER
        })
    ev = CocoKeypointEval(gt_path)
    res = ev.evaluate(preds, verbose=False)
    assert res["AP"] < 0.9
