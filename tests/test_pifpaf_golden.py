"""End-to-end PifPaf decode vs the sequential reference transcription.

Quantifies agreement between ops/pifpaf_decode.pifpaf_decode_batch (parallel
fixed-shape redesign) and tests/golden_pifpaf.reference_pifpaf_decode (the
faithful sequential oracle) on randomized multi-person fields.

Intentional divergences of the TPU decoder (see ops/pifpaf_decode.py
docstring): lazy top-C hi-res CIF evaluated at float query points vs the
oracle's dense grid sampled at rounded ints; bounded candidate tables;
parallel Jacobi frontier growth vs sequential heapq commit order;
component-grouped parallel seed picks + rank-ordered keypoint NMS vs
sequential occupancy maps (the oracle's corner-occupancy quirk is not
reproduced). Agreement is therefore asserted as a keypoint-level match
RATE with a pixel tolerance, not bit-equality: measured (round 4, after
per-part peak seeding + person-component picks + max_humans=32) 99.7% of
oracle keypoints within 5 px over 32 scenes, counts equal on 32/32,
crowded 6-8-person subset 99.3%; asserted >= 98% aggregate / >= 95%
crowded / counts equal on >= 90% of scenes.
"""
import numpy as np
import pytest

import jax

from golden_pifpaf import reference_pifpaf_decode
from hyperpose_tpu.data.synthetic import sample_pose
from hyperpose_tpu.ops.pifpaf_decode import (
    PifPafDecoderConfig, pifpaf_decode_batch, restore_maps,
)
from hyperpose_tpu.utils.topology import PIFPAF_TOPOLOGY

from test_pifpaf import TWO_PEOPLE, synth_fields

IN_HW = (368, 432)
FEAT_HW = (46, 54)
TOL_PX = 5.0


def to_oracle_layout(restored):
    """[B,H,W,F(,2)] restored maps -> reference [F,H,W] / [F,2,H,W]."""
    g = {k: np.asarray(v[0]) for k, v in restored.items()}
    return {
        "pif_conf": g["pif_conf"].transpose(2, 0, 1),
        "pif_vec": g["pif_vec"].transpose(2, 3, 0, 1),
        "pif_scale": g["pif_scale"].transpose(2, 0, 1),
        "paf_conf": g["paf_conf"].transpose(2, 0, 1),
        "paf_src_vec": g["paf_src_vec"].transpose(2, 3, 0, 1),
        "paf_dst_vec": g["paf_dst_vec"].transpose(2, 3, 0, 1),
        "paf_src_scale": g["paf_src_scale"].transpose(2, 0, 1),
        "paf_dst_scale": g["paf_dst_scale"].transpose(2, 0, 1),
    }


def decode_both(fields, cfg=PifPafDecoderConfig()):
    restored = jax.jit(
        restore_maps, static_argnames="stride"
    )(fields, stride=8)
    oracle = reference_pifpaf_decode(
        to_oracle_layout(restored), np.asarray(PIFPAF_TOPOLOGY.limbs)
    )
    ours = jax.device_get(pifpaf_decode_batch(fields, cfg, 8, IN_HW))
    ours_humans = []
    for hid in np.nonzero(ours.valid[0])[0]:
        parts = {}
        for k in np.nonzero(ours.part_valid[0, hid])[0]:
            x = float(ours.coords[0, hid, k, 0] * IN_HW[1])
            y = float(ours.coords[0, hid, k, 1] * IN_HW[0])
            parts[int(k)] = (float(ours.part_scores[0, hid, k]), x, y)
        ours_humans.append(parts)
    return oracle, ours_humans


def match_stats(oracle, ours):
    """Greedy human matching by shared-part mean distance; returns
    (#oracle kpts, #matched within TOL_PX)."""
    total = sum(len(h) for h in oracle)
    matched = 0
    used = set()
    for oh in oracle:
        best, best_d = None, np.inf
        for i, uh in enumerate(ours):
            if i in used:
                continue
            shared = set(oh) & set(uh)
            if not shared:
                continue
            d = np.mean([
                np.hypot(oh[k][1] - uh[k][1], oh[k][2] - uh[k][2])
                for k in shared
            ])
            if d < best_d:
                best, best_d = i, d
        if best is None:
            continue
        used.add(best)
        uh = ours[best]
        for k, (_, x, y) in ((k, v[:3]) for k, v in oh.items()):
            if k in uh and np.hypot(x - uh[k][1], y - uh[k][2]) <= TOL_PX:
                matched += 1
    return total, matched


def random_scene(rng, n_people):
    people = []
    for _ in range(n_people):
        scale = rng.uniform(120, 260)
        cx = rng.uniform(0.25, 0.75) * IN_HW[1]
        cy = rng.uniform(0.35, 0.75) * IN_HW[0]
        joints = sample_pose(rng)[:17] * scale + np.array([cx, cy])
        person = {
            k: (float(np.clip(joints[k, 0], 4, IN_HW[1] - 5)),
                float(np.clip(joints[k, 1], 4, IN_HW[0] - 5)))
            for k in range(17)
        }
        people.append(person)
    fields = synth_fields(people, *FEAT_HW)
    # sub-threshold background noise on the conf logits + slight vec jitter
    for key in ("pif_conf", "paf_conf"):
        noise = rng.normal(0, 0.5, fields[key].shape).astype(np.float32)
        fields[key] = fields[key] + noise
    for key in ("pif_vec", "paf_src_vec", "paf_dst_vec"):
        jit = rng.normal(0, 0.03, fields[key].shape).astype(np.float32)
        fields[key] = fields[key] + jit
    return fields


def test_two_people_fixture_agrees():
    oracle, ours = decode_both(synth_fields(TWO_PEOPLE, *FEAT_HW))
    assert len(oracle) == 2
    assert len(ours) == 2
    total, matched = match_stats(oracle, ours)
    assert total > 0
    assert matched / total >= 0.9, f"{matched}/{total} keypoints matched"


def decode_ours(fields, cfg=PifPafDecoderConfig()):
    ours = jax.device_get(pifpaf_decode_batch(fields, cfg, 8, IN_HW))
    ours_humans = []
    for hid in np.nonzero(ours.valid[0])[0]:
        parts = {}
        for k in np.nonzero(ours.part_valid[0, hid])[0]:
            x = float(ours.coords[0, hid, k, 0] * IN_HW[1])
            y = float(ours.coords[0, hid, k, 1] * IN_HW[0])
            parts[int(k)] = (float(ours.part_scores[0, hid, k]), x, y)
        ours_humans.append(parts)
    return ours_humans


def test_randomized_match_rate():
    """32 randomized scenes: 24 sparse (1-3 people) + 8 crowded (6-8 people,
    heavy overlap), matched against PINNED oracle outputs (the sequential
    transcription costs ~5-40 s/scene, so its deterministic results are
    committed by golden_pifpaf_fixture.py; the live oracle still runs in
    test_two_people_fixture_agrees). Thresholds are the measured agreement
    minus a small margin (measured with this seed: 99.7% keypoints within
    5 px, counts equal on 32/32 scenes, crowded-subset rate 99.3%) — see
    ops/pifpaf_decode.py docstring, which states the same numbers."""
    from golden_pifpaf_fixture import golden_scenes, load_oracle

    oracle_scenes = load_oracle()
    total = matched = 0
    crowd_total = crowd_matched = 0
    count_agree = 0
    n_scenes = 0
    for s, crowded, fields in golden_scenes(random_scene):
        oracle = oracle_scenes[s]
        ours = decode_ours(fields)
        t, m = match_stats(oracle, ours)
        total += t
        matched += m
        n_scenes += 1
        if crowded:
            crowd_total += t
            crowd_matched += m
        count_agree += int(len(oracle) == len(ours))
    assert total > 1500, f"oracle found too few keypoints ({total})"
    rate = matched / total
    assert rate >= 0.98, f"keypoint match rate {rate:.3f} ({matched}/{total})"
    crowd_rate = crowd_matched / max(crowd_total, 1)
    assert crowd_rate >= 0.95, (
        f"crowded-scene match rate {crowd_rate:.3f} "
        f"({crowd_matched}/{crowd_total})"
    )
    assert count_agree >= int(0.90 * n_scenes), (
        f"human-count agreement {count_agree}/{n_scenes}"
    )


def test_empty_fields_agree():
    fields = synth_fields([], *FEAT_HW)
    oracle, ours = decode_both(fields)
    assert oracle == []
    assert ours == []
