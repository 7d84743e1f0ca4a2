"""MPII PCKh@0.5 evaluation.

(reference: hyperpose/Dataset/mpii_dataset/dataset.py:102+ implements the
official PCKh metric in-house.) A predicted keypoint is correct when its
distance to the ground truth is below 0.5 * head-segment length (the
standard uses 0.6 * head-box diagonal as the reference length, SC_BIAS).
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

SC_BIAS = 0.6
PCKH_THRESH = 0.5

MPII_PART_NAMES = [
    "rankle", "rknee", "rhip", "lhip", "lknee", "lankle", "pelvis",
    "thorax", "upperneck", "headtop", "rwrist", "relbow", "rshoulder",
    "lshoulder", "lelbow", "lwrist",
]


def pckh_eval(
    pd_annotations: list[dict],
    gt: dict[int, tuple[np.ndarray, np.ndarray]],
    thresh: float = PCKH_THRESH,
) -> dict[str, float]:
    """pd_annotations: [{image_id, keypoints (16*3 native order), score}].
    gt: image_id -> (kpts [M, 16, 3], head_boxes [M, 4] x1y1x2y2)."""
    preds_by_img: dict[int, list[np.ndarray]] = defaultdict(list)
    for ann in pd_annotations:
        preds_by_img[ann["image_id"]].append(
            np.asarray(ann["keypoints"], np.float32).reshape(16, 3)
        )

    correct = np.zeros(16)
    total = np.zeros(16)
    for image_id, (gt_kpts, head_boxes) in gt.items():
        preds = preds_by_img.get(image_id, [])
        used = set()
        for gk, hb in zip(gt_kpts, head_boxes):
            head_size = SC_BIAS * np.linalg.norm(hb[2:4] - hb[0:2])
            if head_size < 1e-3:
                continue
            vis = gk[:, 2] > 0
            if not vis.any():
                continue
            # match prediction by mean visible-joint distance
            best, best_d = None, np.inf
            for pi, pk in enumerate(preds):
                if pi in used:
                    continue
                pv = pk[:, 2] > 0
                both = vis & pv
                if not both.any():
                    continue
                d = np.mean(np.linalg.norm(
                    pk[both, :2] - gk[both, :2], axis=-1
                ))
                if d < best_d:
                    best, best_d = pi, d
            if best is None:
                total += vis
                continue
            used.add(best)
            pk = preds[best]
            dist = np.linalg.norm(pk[:, :2] - gk[:, :2], axis=-1) / head_size
            hit = (dist <= thresh) & (pk[:, 2] > 0)
            correct += vis & hit
            total += vis

    per_part = np.where(total > 0, correct / np.maximum(total, 1), np.nan)
    results = {
        f"PCKh_{name}": float(per_part[i])
        for i, name in enumerate(MPII_PART_NAMES)
    }
    results["PCKh"] = float(np.nanmean(per_part))
    return results
