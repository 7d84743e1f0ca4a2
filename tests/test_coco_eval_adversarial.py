"""Adversarial, analytically-derived fixtures for eval/coco_eval.py.

pycocotools is not installable offline, so the in-house COCOeval
reimplementation is validated against HAND-DERIVED expected values computed
from the published cocoapi algorithm (cocoeval.py evaluateImg/accumulate/
summarize for iouType='keypoints'), exercising exactly the corners where a
reimplementation silently drifts:

  - greedy matching is by detection SCORE order, not best-OKS assignment
  - a later gt with EQUAL OKS replaces the earlier candidate (`<` continue)
  - crowd gts may be matched by multiple detections; those dts are ignored
  - num_keypoints==0 gts are ignored but still ignore-match detections
  - maxDets=20 truncation by score
  - area-range boundaries are inclusive on both ends
  - UNMATCHED detections outside the area range are ignored, not FPs
    (dt area = tight bbox over all keypoint xy, per cocoapi loadRes)
  - score ties resolve by stable (mergesort) insertion order
  - 101-point interpolated AP with the precision envelope

Documented intentional divergences from pycocotools:
  - metrics with no valid gt return NaN (cocoapi summarize returns -1)
  - evaluation runs only over images present in the predictions, matching
    the reference's official_eval gt filtering
    (reference: Dataset/mscoco_dataset/dataset.py:130-146)
"""
import json
import math

import numpy as np
import pytest

from hyperpose_tpu.eval.coco_eval import (
    AREA_RANGES, MAX_DETS, OKS_THRESHOLDS, CocoKeypointEval, compute_oks,
)

# Independent copy of the published COCO keypoint sigmas (cocoapi
# params.kpt_oks_sigmas) so the OKS hand-check does not reuse package code.
SIGMAS = [
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
]
S0 = SIGMAS[0]  # nose; single-keypoint fixtures use part 0

N_REC = 101  # recall points 0:.01:1


def kpt_triples(entries):
    """entries: {part: (x, y, v)} -> flat 51-float list (missing = zeros)."""
    flat = [0.0] * 51
    for p, (x, y, v) in entries.items():
        flat[3 * p: 3 * p + 3] = [float(x), float(y), float(v)]
    return flat


def gt_ann(img_id, ann_id, entries, area, bbox=None, iscrowd=0):
    kp = kpt_triples(entries)
    return {
        "id": ann_id, "image_id": img_id, "category_id": 1,
        "keypoints": kp, "num_keypoints": sum(1 for *_xy, v in entries.values() if v > 0),
        "area": float(area), "bbox": bbox or [0.0, 0.0, 1.0, 1.0],
        "iscrowd": iscrowd,
    }


def dt_ann(img_id, entries, score):
    return {
        "image_id": img_id, "category_id": 1,
        "keypoints": kpt_triples(entries), "score": float(score),
    }


def make_eval(tmp_path, gts, img_ids):
    path = tmp_path / "gt.json"
    path.write_text(json.dumps({
        "images": [{"id": i} for i in img_ids],
        "annotations": gts,
        "categories": [{"id": 1, "name": "person"}],
    }))
    return CocoKeypointEval(str(path))


def dist_for_oks(oks, area, sigma=S0):
    """Distance giving a target single-visible-keypoint OKS at `area`."""
    return math.sqrt(-math.log(oks) * 2.0 * area * (2.0 * sigma) ** 2)


# ---------------------------------------------------------------------------
# OKS formula, hand-computed
# ---------------------------------------------------------------------------

def test_oks_formula_hand_computed():
    area = 2500.0
    gt_entries = {p: (10.0 * p, 7.0 * p, 2) for p in range(17)}
    dt_entries = {p: (10.0 * p + 3.0, 7.0 * p + 4.0, 2) for p in range(17)}
    d2 = 3.0**2 + 4.0**2
    expected = np.mean([
        math.exp(-d2 / ((2 * s) ** 2) / (area + np.spacing(1)) / 2.0)
        for s in SIGMAS
    ])
    got = compute_oks(
        np.asarray(kpt_triples(dt_entries)),
        np.asarray(kpt_triples(gt_entries)), area,
    )
    assert got == pytest.approx(expected, abs=1e-12)


def test_oks_zero_visible_uses_expanded_bbox():
    # k1 == 0: error is distance OUTSIDE the bbox expanded by 1x each side.
    bbox = [10.0, 20.0, 4.0, 6.0]  # expanded: x in [6,18], y in [14,32]
    gt_entries = {p: (0.0, 0.0, 0) for p in range(17)}
    inside = {p: (7.0, 15.0, 2) for p in range(17)}
    g = gt_ann(1, 1, gt_entries, area=100.0, bbox=bbox)
    got = compute_oks(
        np.asarray(kpt_triples(inside)), np.asarray(g["keypoints"]),
        g["area"], np.asarray(bbox),
    )
    assert got == pytest.approx(1.0)
    outside = {p: (20.0, 34.0, 2) for p in range(17)}  # dx=2, dy=2 outside
    d2 = 2.0**2 + 2.0**2
    expected = np.mean([
        math.exp(-d2 / ((2 * s) ** 2) / (100.0 + np.spacing(1)) / 2.0)
        for s in SIGMAS
    ])
    got = compute_oks(
        np.asarray(kpt_triples(outside)), np.asarray(g["keypoints"]),
        g["area"], np.asarray(bbox),
    )
    assert got == pytest.approx(expected, abs=1e-12)


# ---------------------------------------------------------------------------
# Perfect predictions
# ---------------------------------------------------------------------------

def test_perfect_predictions(tmp_path):
    gts, dts = [], []
    ann_id = 1
    for img in (1, 2, 3):
        for person in range(img):  # 1, 2, 3 people
            entries = {
                p: (100.0 * person + 5.0 * p, 50.0 * img + 3.0 * p, 2)
                for p in range(17)
            }
            gts.append(gt_ann(img, ann_id, entries, area=5000.0))
            dts.append(dt_ann(img, entries, score=0.9 - 0.01 * person))
            ann_id += 1
    ev = make_eval(tmp_path, gts, [1, 2, 3])
    res = ev.evaluate(dts, verbose=False)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(1.0)
    assert res["AR"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Greedy matching is by score order, not best OKS
# ---------------------------------------------------------------------------

def test_greedy_by_score_not_best_oks(tmp_path):
    area = 10000.0
    gts = [gt_ann(1, 1, {0: (100.0, 100.0, 2)}, area)]
    # High-score dt with OKS ~0.72 (passes thr .50-.70, fails .75+);
    # low-score dt essentially exact (OKS ~1).
    d_mid = dist_for_oks(0.72, area)
    dts = [
        dt_ann(1, {0: (100.0 + d_mid, 100.0, 2)}, score=0.9),
        dt_ann(1, {0: (100.0, 100.0, 2)}, score=0.1),
    ]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    # thr <= .70 (5 thresholds): high-score dt matches first -> tps=[1,0]
    #   -> envelope precision 1 at every reached recall point -> AP_t = 1.
    # thr >= .75 (5 thresholds): high-score dt is an FP ranked first,
    #   low-score dt TP -> pr=[0,.5] -> envelope .5 -> AP_t = 0.5.
    expected = (5 * 1.0 + 5 * 0.5) / 10
    assert res["AP"] == pytest.approx(expected, abs=1e-9)
    # A best-OKS (non-greedy) matcher would give AP = 0.5; guard that.
    assert res["AP"] != pytest.approx(0.5, abs=1e-3)


# ---------------------------------------------------------------------------
# Later gt with EQUAL OKS wins (cocoapi `<` continue quirk)
# ---------------------------------------------------------------------------

def test_equal_oks_later_gt_wins(tmp_path):
    area = 10000.0
    d = dist_for_oks(0.80, area)  # passes .50-.80 (7 thr), fails .85+ (3)
    gts = [
        gt_ann(1, 1, {0: (100.0, 100.0, 2)}, area),          # gt1 (earlier)
        gt_ann(1, 2, {0: (100.0 + 2 * d, 100.0, 2)}, area),  # gt2 (later)
    ]
    dts = [
        # equidistant -> bit-identical OKS to both gts; must take gt2
        dt_ann(1, {0: (100.0 + d, 100.0, 2)}, score=0.9),
        # exact on gt2; OKS to gt1 = exp(-4*ln(1/0.8)) ~ 0.41, fails all thr
        dt_ann(1, {0: (100.0 + 2 * d, 100.0, 2)}, score=0.5),
    ]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    # thr <= .80: dt1 -> gt2 (later wins). dt2 finds gt2 taken, gt1 OKS
    #   too low -> FP. tps=[1,0], npig=2 -> rc=[.5,.5], pr=[1,.5],
    #   envelope [1,.5]; recall points <= .5 (51 of 101) read precision 1.
    ap_low = 51 / N_REC
    # thr > .80: dt1 FP, dt2 -> gt2. tps=[0,1] -> rc=[0,.5], pr=[0,.5],
    #   envelope [.5,.5]; recall points <= .5 read .5.
    ap_high = 51 * 0.5 / N_REC
    expected = (7 * ap_low + 3 * ap_high) / 10
    assert res["AP"] == pytest.approx(expected, abs=1e-9)
    # If the EARLIER gt had won, dt2 would also match -> AP would be 1 at
    # low thresholds; guard against that implementation.
    assert res["AP"] < 0.6


# ---------------------------------------------------------------------------
# Crowd annotations absorb multiple detections as ignores
# ---------------------------------------------------------------------------

def test_crowd_multi_match_ignored(tmp_path):
    area = 10000.0
    gts = [
        gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area),
        gt_ann(1, 2, {0: (300.0, 300.0, 2)}, area, iscrowd=1),
    ]
    dts = [
        dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.9),     # TP on real gt
        dt_ann(1, {0: (300.0, 300.0, 2)}, score=0.8),   # crowd match 1
        dt_ann(1, {0: (301.0, 300.0, 2)}, score=0.7),   # crowd match 2
    ]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    # Both crowd-matched dts are ignored (neither TP nor FP); npig=1.
    assert res["AP"] == pytest.approx(1.0)
    assert res["AR"] == pytest.approx(1.0)


def test_num_keypoints_zero_gt_is_ignore_match(tmp_path):
    area = 10000.0
    gts = [
        gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area),
        # all-invisible gt: ignored, matched via expanded-bbox OKS
        gt_ann(1, 2, {p: (0.0, 0.0, 0) for p in range(17)}, area,
               bbox=[280.0, 280.0, 40.0, 40.0]),
    ]
    dts = [
        dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.9),
        # higher-score junk inside the empty gt's expanded bbox: must be
        # ignore-matched, NOT an FP ranked above the TP
        dt_ann(1, {p: (300.0, 300.0, 2) for p in range(17)}, score=0.95),
    ]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AR"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# maxDets = 20 truncation by score
# ---------------------------------------------------------------------------

def test_maxdets_truncation(tmp_path):
    area = 10000.0
    gts = [gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area)]
    junk = [
        dt_ann(1, {0: (500.0 + 10 * i, 500.0, 2)}, score=0.9 - 0.001 * i)
        for i in range(24)
    ]
    perfect_low = dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.01)
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(junk + [perfect_low], verbose=False)
    # perfect dt ranked 25th -> truncated at 20 -> nothing matches
    assert res["AP"] == pytest.approx(0.0)
    assert res["AR"] == pytest.approx(0.0)

    perfect_high = dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.99)
    res = ev.evaluate(junk + [perfect_high], verbose=False)
    # perfect dt ranked 1st: tps=[1,0..] -> precision 1 at recall 1 -> AP=1
    assert res["AP"] == pytest.approx(1.0)
    assert len(junk) + 1 > MAX_DETS  # fixture sanity


# ---------------------------------------------------------------------------
# Area-range boundaries are inclusive; unmatched out-of-range dts ignored
# ---------------------------------------------------------------------------

def test_area_boundary_inclusive(tmp_path):
    med_lo, med_hi = AREA_RANGES["medium"]
    assert med_lo == 32**2 and med_hi == 96**2
    gts = [gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area=float(med_lo))]
    dts = [dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.9)]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    assert res["AP_medium"] == pytest.approx(1.0)  # 32^2 counted in medium
    assert math.isnan(res["AP_large"])             # no large gt -> NaN

    gts = [gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area=float(med_hi))]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    # 96^2 is inclusive in BOTH medium and large (cocoapi quirk)
    assert res["AP_medium"] == pytest.approx(1.0)
    assert res["AP_large"] == pytest.approx(1.0)


def test_unmatched_dt_outside_area_range_ignored(tmp_path):
    # Large gt + perfect dt; higher-scored junk dt whose keypoint bbox is
    # tiny. In the LARGE range the junk dt is out-of-range and unmatched ->
    # ignored (cocoapi evaluateImg dt-area rule), so AP_large = 1.
    # In the ALL range the junk dt is a top-ranked FP -> AP = 0.5.
    area = 20000.0  # > 96^2
    spread = {p: (100.0 + 10.0 * p, 100.0 + 9.0 * p, 2) for p in range(17)}
    gts = [gt_ann(1, 1, spread, area)]
    junk = {p: (500.0 + 0.1 * p, 500.0, 2) for p in range(17)}  # bbox ~2.4
    dts = [
        dt_ann(1, junk, score=0.95),
        dt_ann(1, spread, score=0.9),
    ]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    assert res["AP_large"] == pytest.approx(1.0)
    # all range: tps=[0,1] -> pr=[0,.5] -> envelope .5 everywhere reached
    assert res["AP"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# Score ties: stable mergesort keeps insertion order
# ---------------------------------------------------------------------------

def test_score_tie_stable_order(tmp_path):
    area = 10000.0
    gts = [gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area)]
    fp = dt_ann(1, {0: (500.0, 500.0, 2)}, score=0.5)
    tp = dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.5)
    ev = make_eval(tmp_path, gts, [1])
    # FP first: order preserved -> tps=[0,1] -> AP=0.5
    res = ev.evaluate([fp, tp], verbose=False)
    assert res["AP"] == pytest.approx(0.5)
    # TP first -> tps=[1,0] -> AP=1
    res = ev.evaluate([tp, fp], verbose=False)
    assert res["AP"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# 101-point interpolation partial-recall case
# ---------------------------------------------------------------------------

def test_interpolation_partial_recall(tmp_path):
    # 2 gts, only one detected: rc=[.5], pr=[1]. Recall points 0..0.5
    # (51 of 101) read precision 1; the rest read 0.
    area = 10000.0
    gts = [
        gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area),
        gt_ann(1, 2, {0: (300.0, 300.0, 2)}, area),
    ]
    dts = [dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.9)]
    ev = make_eval(tmp_path, gts, [1])
    res = ev.evaluate(dts, verbose=False)
    assert res["AP"] == pytest.approx(51 / N_REC, abs=1e-9)
    assert res["AR"] == pytest.approx(0.5)


def test_multi_image_accumulate_global_score_sort(tmp_path):
    # TP in img1 (score .3) and FP in img2 (score .8): the global mergesort
    # must rank the FP first -> pr=[0,.5] -> AP=0.5. A per-image
    # accumulation (or unstable ordering) would give 1.0.
    area = 10000.0
    gts = [
        gt_ann(1, 1, {0: (50.0, 50.0, 2)}, area),
    ]
    dts = [
        dt_ann(1, {0: (50.0, 50.0, 2)}, score=0.3),
        dt_ann(2, {0: (700.0, 700.0, 2)}, score=0.8),
    ]
    ev = make_eval(tmp_path, gts, [1, 2])
    res = ev.evaluate(dts, verbose=False)
    assert res["AP"] == pytest.approx(0.5)
