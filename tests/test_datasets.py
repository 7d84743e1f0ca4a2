"""Dataset framework: COCO/MPII parsing, converters, masks, official evals."""
import json
import os

import numpy as np
import pytest

from hyperpose_tpu import Config


@pytest.fixture(autouse=True)
def reset_config():
    Config.reset()
    yield
    Config.reset()


def rle_encode(mask: np.ndarray) -> dict:
    """Uncompressed COCO RLE (column-major runs) for test fixtures."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    counts, prev, run = [], 0, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)
    return {"counts": counts, "size": list(mask.shape)}


def rle_compress(counts: list[int]) -> str:
    """COCO compressed-RLE string (inverse of rle_decode_counts; mirrors
    pycocotools rleToString)."""
    out = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (ch & 0x10)) and not (
                x == -1 and (ch & 0x10)
            )
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
    return "".join(out)


def make_coco(tmp_path, n_imgs=3):
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    for split in ("train", "val"):
        (root / f"{split}2017").mkdir()
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        h, w = 120, 160
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        fname = f"{img_id:012d}.jpg"
        for split in ("train", "val"):
            cv2.imwrite(str(root / f"{split}2017" / fname), img)
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": fname})
        # one fully-annotated person
        kpts = []
        cx, cy = rng.uniform(40, 120), rng.uniform(30, 90)
        for _ in range(17):
            kpts += [float(cx + rng.uniform(-20, 20)),
                     float(cy + rng.uniform(-25, 25)), 2]
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": kpts, "num_keypoints": 17, "iscrowd": 0,
            "area": 2000.0, "bbox": [cx - 25, cy - 30, 50, 60],
            "segmentation": [[cx - 25, cy - 30, cx + 25, cy - 30,
                              cx + 25, cy + 30, cx - 25, cy + 30]],
        })
        ann_id += 1
        # one crowd region (RLE mask over the top-left corner)
        crowd = np.zeros((h, w), np.uint8)
        crowd[:20, :30] = 1
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": [0.0] * 51, "num_keypoints": 0, "iscrowd": 1,
            "area": 600.0, "bbox": [0, 0, 30, 20],
            "segmentation": rle_encode(crowd),
        })
        ann_id += 1
    blob = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}]}
    for split in ("train", "val"):
        with open(root / "annotations" /
                  f"person_keypoints_{split}2017.json", "w") as f:
            json.dump(blob, f)
    return str(root), annotations


def test_rle_compressed_roundtrip():
    from hyperpose_tpu.data.mscoco import rle_decode_counts, rle_to_mask

    rng = np.random.default_rng(1)
    mask = (rng.random((13, 17)) > 0.6).astype(np.uint8)
    rle = rle_encode(mask)
    # uncompressed path
    np.testing.assert_array_equal(rle_to_mask(rle), mask)
    # compressed path
    s = rle_compress(rle["counts"])
    assert rle_decode_counts(s) == list(rle["counts"])
    np.testing.assert_array_equal(
        rle_to_mask({"counts": s, "size": rle["size"]}), mask
    )


def test_coco_train_records_openpose(tmp_path):
    from hyperpose_tpu.data.base import get_dataset

    root, _ = make_coco(tmp_path)
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_dataset_path(root)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    records = ds.get_train_records()
    assert len(records) == 3
    rec = records[0]
    # 19 rows (18 parts + dead background row), neck synthesized
    assert rec.kpts.shape == (1, 19, 2)
    assert rec.valid[0, 1]  # Neck = shoulder midpoint
    assert not rec.valid[0, 18]  # background row dead
    # crowd region masked out
    mask = rec.mask_fn()
    assert mask.shape == (120, 160)
    assert mask[5, 5] == 0.0 and mask[100, 100] == 1.0
    # eval records exist
    assert len(ds.get_eval_records()) == 3


def test_coco_output_converter_roundtrip(tmp_path):
    """input converter -> output converter recovers the original COCO
    keypoints (reference: mscoco_dataset/define.py converters)."""
    from hyperpose_tpu.data.mscoco import (
        OPPS_FROM_COCO17, coco17_to_model, model_to_coco17,
    )

    rng = np.random.default_rng(2)
    kpts17 = rng.uniform(0, 100, (17, 2)).astype(np.float32)
    vis = np.ones(17, bool)
    kpts, valid = coco17_to_model(kpts17, vis, OPPS_FROM_COCO17, 19)
    flat = model_to_coco17(kpts, OPPS_FROM_COCO17)
    out = np.asarray(flat, np.float32).reshape(17, 3)
    np.testing.assert_allclose(out[:, :2], kpts17, atol=1e-5)
    assert (out[:, 2] == 1).all()


def test_coco_official_eval_perfect(tmp_path):
    from hyperpose_tpu.data.base import get_dataset

    root, anns = make_coco(tmp_path)
    Config.set_model_type(Config.MODEL.Pifpaf)
    Config.set_dataset_path(root)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    preds = [
        {"image_id": a["image_id"], "category_id": 1,
         "keypoints": list(a["keypoints"]), "score": 0.95}
        for a in anns if not a["iscrowd"]
    ]
    metrics = ds.official_eval(preds, str(tmp_path / "eval"))
    assert metrics["AP"] == pytest.approx(1.0)


def make_mpii(tmp_path, n=3):
    import cv2

    rng = np.random.default_rng(3)
    root = tmp_path / "mpii"
    (root / "images").mkdir(parents=True)
    entries = []
    for i in range(n):
        fname = f"{i:09d}.jpg"
        cv2.imwrite(str(root / "images" / fname),
                    rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
        joints = np.zeros((16, 3))
        cx, cy = rng.uniform(50, 110), rng.uniform(40, 80)
        for j in range(16):
            joints[j] = (cx + rng.uniform(-20, 20),
                         cy + rng.uniform(-25, 25), 1)
        entries.append({
            "image": fname, "img_train": 1 if i < 2 else 0,
            "people": [{
                "joints": joints.tolist(),
                "headbox": [cx - 10, cy - 30, cx + 10, cy - 10],
            }],
        })
    with open(root / "mpii_annotations.json", "w") as f:
        json.dump(entries, f)
    return str(root), entries


def test_mpii_records_and_pckh(tmp_path):
    from hyperpose_tpu.data.base import get_dataset

    root, entries = make_mpii(tmp_path)
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_dataset_type(Config.DATA.MPII)
    Config.set_dataset_path(root)
    cfg = Config.get_config(create_dirs=False)
    assert cfg.model.n_pos == 16  # auto part count for MPII
    ds = get_dataset(cfg)
    records = ds.get_train_records()
    assert len(records) == 2  # img_train==1 only
    assert records[0].kpts.shape == (1, 16, 2)
    assert records[0].valid[0].sum() >= 14  # 14 native + Center

    # perfect predictions -> PCKh 100 on the eval split
    eval_entries = [e for e in entries if e["img_train"] == 0]
    preds = []
    for i, entry in enumerate(eval_entries):
        j = np.asarray(entry["people"][0]["joints"], np.float32)
        preds.append({
            "image_id": i,
            "keypoints": [float(v) for row in j for v in row],
            "score": 1.0,
        })
    metrics = ds.official_eval(preds, str(tmp_path / "eval"))
    assert metrics["PCKh"] == pytest.approx(1.0)


def test_get_dataset_userdef_and_multiple(tmp_path):
    from hyperpose_tpu.data.base import get_dataset
    from hyperpose_tpu.data.multi import UserPoseDataset

    k = np.zeros((1, 19, 2), np.float32)
    v = np.ones((1, 19), bool)
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_userdef_dataset([("a.jpg", k, v)])
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    assert len(ds.get_train_records()) == 1

    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_userdef_dataset([
        UserPoseDataset([("a.jpg", k, v)]),
        UserPoseDataset([("b.jpg", k, v), ("c.jpg", k, v)]),
    ])
    Config.set_dataset_type(Config.DATA.MULTIPLE)
    cfg = Config.get_config(create_dirs=False)
    ds = get_dataset(cfg)
    assert len(ds.get_train_records()) == 3
