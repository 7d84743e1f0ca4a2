"""Validation of eval/mpii_eval.py against the reference PCKh protocol.

`reference_pckh_oracle` is a deliberately sequential numpy TRANSCRIPTION of
the reference's in-house PCKh evaluation
(reference: hyperpose/Dataset/mpii_dataset/dataset.py:130-229) used purely
as a test oracle, plus analytic fixtures pinning the protocol's quirks:
headsize is the raw head-box diagonal (no 0.6 SC_BIAS), matching is
prediction-major in score order with pelvis/thorax masked, and numerator
hits are counted without consulting per-joint visibility.
"""
import numpy as np
import pytest

from hyperpose_tpu.eval.mpii_eval import pckh_eval


def reference_pckh_oracle(pd_anns, gt, thresh=0.5):
    """Sequential transcription of dataset.py:130-229 (test oracle only)."""
    pd_dict = {}
    for ann in pd_anns:
        k = np.array(ann["keypoints"], np.float64).reshape(16, 3)
        pd_dict.setdefault(ann["image_id"], []).append(
            {"keypoints": k[:, :2].T, "score": ann["score"]}  # [2,16]
        )

    all_pd, all_gt, all_vis, all_heads = [], [], [], []
    for image_id in pd_dict:
        if image_id not in gt:
            continue
        gt_kpts, head_boxes = gt[image_id]
        gt_anns = []
        for gi in range(gt_kpts.shape[0]):
            g = np.asarray(gt_kpts[gi], np.float64)
            hb = np.asarray(head_boxes[gi], np.float64)
            gt_anns.append({
                "keypoints": g[:, :2].T,                      # [2,16]
                "vis": np.where(g[:, 2] > 0, 1, 0),
                # reference headbbx = (cx, cy, w, h) (format.py:15-26)
                "headbbx": np.array([
                    (hb[0] + hb[2]) / 2, (hb[1] + hb[3]) / 2,
                    hb[2] - hb[0], hb[3] - hb[1],
                ]),
            })
        pd_img_anns = np.array(pd_dict[image_id])
        sort_idx = np.argsort([-a["score"] for a in pd_img_anns])
        pd_img_anns = pd_img_anns[sort_idx]
        match_pd_ids = np.full(len(gt_anns), -1)
        for pd_id, pd_ann in enumerate(pd_img_anns):
            pd_kpts = pd_ann["keypoints"]
            match_id, match_dist = -1, np.inf
            for gt_id, gt_ann in enumerate(gt_anns):
                if match_pd_ids[gt_id] != -1:
                    continue
                gt_vis = gt_ann["vis"]
                vis_mask = np.ones(gt_vis.shape)
                vis_mask[6:8] = 0
                vis_num = np.sum(gt_vis)
                if vis_num == 0:
                    continue
                dist = np.sum(np.linalg.norm(
                    (pd_kpts - gt_ann["keypoints"]) * gt_vis * vis_mask,
                    axis=0)) / vis_num
                if dist < match_dist:
                    match_dist, match_id = dist, gt_id
            if match_id != -1:
                match_pd_ids[match_id] = pd_id
        for gt_id, gt_ann in enumerate(gt_anns):
            all_gt.append(gt_ann["keypoints"])
            all_vis.append(gt_ann["vis"])
            all_heads.append(gt_ann["headbbx"])
            pid = match_pd_ids[gt_id]
            all_pd.append(pd_img_anns[pid]["keypoints"] if pid != -1
                          else np.zeros_like(all_gt[-1]))

    all_pd = np.array(all_pd).transpose([1, 2, 0])       # [2,16,N]
    all_gt = np.array(all_gt).transpose([1, 2, 0])
    all_vis = np.array(all_vis).transpose([1, 0])        # [16,N]
    all_heads = np.array(all_heads).transpose([1, 0])    # [4,N]
    headsize = np.linalg.norm(all_heads[2:4, :], axis=0)
    dist = np.linalg.norm(all_pd - all_gt, axis=0) / headsize
    jnt_vis_num = np.sum(all_vis, axis=1)
    pckh = 100.0 * np.sum(dist <= thresh, axis=1) / jnt_vis_num
    rng = np.arange(0, thresh + 0.1, 0.1)
    pck_all = np.zeros((len(rng), 16))
    for r in range(len(rng)):
        pck_all[r] = 100.0 * np.sum(dist <= rng[r], axis=1) / jnt_vis_num
    pckh_mask = np.ma.array(pckh, mask=False)
    pckh_mask.mask[6:8] = True
    jnt_count = np.ma.array(jnt_vis_num, mask=False)
    jnt_count.mask[6:8] = True
    jnt_ratio = jnt_count / np.sum(jnt_count).astype(np.float64)
    return {
        "Head": pckh[9],
        "Shoulder": 0.5 * (pckh[13] + pckh[12]),
        "Elbow": 0.5 * (pckh[14] + pckh[11]),
        "Wrist": 0.5 * (pckh[15] + pckh[10]),
        "Hip": 0.5 * (pckh[3] + pckh[2]),
        "Knee": 0.5 * (pckh[4] + pckh[1]),
        "Ankle": 0.5 * (pckh[5] + pckh[0]),
        "Mean": float(np.sum(pckh_mask * jnt_ratio)),
        "Mean@0.1": float(np.mean(np.sum(pck_all[1:, :] * jnt_ratio, axis=1))),
    }


def _random_fixture(seed, n_imgs=6):
    rng = np.random.default_rng(seed)
    gt, pd_anns = {}, []
    for img in range(n_imgs):
        m = int(rng.integers(1, 4))
        kpts = np.zeros((m, 16, 3))
        boxes = np.zeros((m, 4))
        for i in range(m):
            c = rng.uniform(100, 500, 2)
            kpts[i, :, :2] = c + rng.normal(0, 40, (16, 2))
            kpts[i, :, 2] = rng.random(16) < 0.8
            hw = rng.uniform(20, 60, 2)
            boxes[i] = [c[0] - hw[0], c[1] - hw[1], c[0] + hw[0], c[1] + hw[1]]
        gt[img] = (kpts, boxes)
        # predictions: noisy copies of a random subset + one junk detection
        for i in range(m):
            if rng.random() < 0.8:
                noisy = kpts[i].copy()
                noisy[:, :2] += rng.normal(0, 15, (16, 2))
                noisy[:, 2] = 1
                pd_anns.append({
                    "image_id": img, "keypoints": noisy.reshape(-1).tolist(),
                    "score": float(rng.uniform(0.2, 1.0)),
                })
        junk = rng.uniform(0, 700, (16, 3))
        junk[:, 2] = 1
        pd_anns.append({
            "image_id": img, "keypoints": junk.reshape(-1).tolist(),
            "score": float(rng.uniform(0.0, 0.3)),
        })
    return pd_anns, gt


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_matches_reference_transcription(seed):
    pd_anns, gt = _random_fixture(seed)
    ours = pckh_eval(pd_anns, gt)
    oracle = reference_pckh_oracle(pd_anns, gt)
    for key, val in oracle.items():
        assert ours[key] == pytest.approx(val, abs=1e-9), key


def test_headsize_is_raw_diagonal_no_sc_bias():
    # head box diagonal = 100; threshold distance = 0.5 * 100 = 50.
    # A prediction offset by 45 must HIT (with a 0.6 SC_BIAS the cutoff
    # would be 30 and it would miss); offset 55 must MISS.
    kpts = np.zeros((1, 16, 3))
    kpts[0, :, 0] = np.arange(16) * 200.0
    kpts[0, :, 1] = 300.0
    kpts[0, :, 2] = 1
    boxes = np.array([[0.0, 0.0, 60.0, 80.0]])  # diag 100
    gt = {0: (kpts, boxes)}
    for offset, expect in [(45.0, 1.0), (55.0, 0.0)]:
        moved = kpts[0].copy()
        moved[:, 1] += offset
        preds = [{"image_id": 0, "keypoints": moved.reshape(-1).tolist(),
                  "score": 0.9}]
        res = pckh_eval(preds, gt)
        assert res["Mean"] == pytest.approx(expect * 100.0), offset


def test_match_is_score_order_greedy():
    # Two gts; the HIGH-score pred sits between them but nearer gt2, so it
    # takes gt2 first; the LOW-score exact-on-gt2 pred then falls back to
    # gt1 (far -> all misses). Score-order greedy gives Mean 50.
    kpts = np.zeros((2, 16, 3))
    kpts[0, :, 0] = 0.0
    kpts[1, :, 0] = 100.0
    kpts[:, :, 1] = 50.0
    kpts[:, :, 2] = 1
    boxes = np.array([[0, 0, 30, 40], [100, 0, 130, 40]], np.float64)
    gt = {0: (kpts, boxes)}
    between = kpts[1].copy()
    between[:, 0] = 60.0  # nearer gt2 (dist 40) than gt1 (dist 60)
    exact2 = kpts[1].copy()
    preds = [
        {"image_id": 0, "keypoints": between.reshape(-1).tolist(),
         "score": 0.9},
        {"image_id": 0, "keypoints": exact2.reshape(-1).tolist(),
         "score": 0.1},
    ]
    res = pckh_eval(preds, gt)
    # head diag 50 -> cutoff 25. between->gt2: dist 40 miss; exact2->gt1:
    # dist 100 miss => Mean 0. If matching were globally optimal (exact2
    # on gt2, between on gt1), gt2 would be all hits -> Mean 50.
    assert res["Mean"] == pytest.approx(0.0)


def test_invisible_joint_numerator_quirk():
    # gt joint 0 invisible at (0, 0); the matched prediction puts joint 0
    # at (0, 0) too -> dist 0 <= thresh counts in the numerator even though
    # joint 0 is invisible (reference dataset.py:204-206 quirk).
    kpts = np.zeros((2, 16, 3))
    kpts[:, :, 0] = np.arange(16) * 50.0
    kpts[:, :, 1] = 100.0
    kpts[:, :, 2] = 1
    kpts[0, 0] = (0.0, 0.0, 0)   # person 0, joint 0 invisible at origin
    boxes = np.array([[0, 0, 30, 40], [0, 50, 30, 90]], np.float64)
    gt = {0: (kpts, boxes)}
    preds = [
        {"image_id": 0, "keypoints": kpts[m].reshape(-1).tolist(),
         "score": 0.9 - 0.1 * m}
        for m in range(2)
    ]
    res = pckh_eval(preds, gt)
    # joint 0 (rankle): 2 hits (incl. the invisible one) / 1 visible = 200%
    assert res["PCKh_rankle"] == pytest.approx(2.0)
    oracle = reference_pckh_oracle(preds, gt)
    assert res["Ankle"] == pytest.approx(oracle["Ankle"])


def test_unmatched_gt_counts_as_zeros():
    # One gt, zero predictions for its image but one for another image:
    # the gt gets an all-zero pseudo-prediction; its joints (far from 0)
    # all miss -> Mean 0; PCKh alias 0.
    kpts = np.zeros((1, 16, 3))
    kpts[0, :, :2] = 400.0
    kpts[0, :, 2] = 1
    boxes = np.array([[380, 380, 420, 420]], np.float64)
    gt = {0: (kpts, boxes), 1: (kpts.copy(), boxes.copy())}
    junk = np.full((16, 3), 400.0)
    preds = [
        {"image_id": 0, "keypoints": kpts[0].reshape(-1).tolist(),
         "score": 0.9},
        # second pred in image 0 stays unmatched (only one gt): dropped
        {"image_id": 0, "keypoints": junk.reshape(-1).tolist(),
         "score": 0.5},
    ]
    res = pckh_eval(preds, gt)
    # image 1 has no predictions -> excluded entirely (predicted-image set)
    assert res["Mean"] == pytest.approx(100.0)
