"""PAF decoder tests on synthetic feature maps."""
import numpy as np
import pytest

from hyperpose_tpu.ops.paf_decode import (
    DecodedSkeletons, PafDecoderConfig, paf_decode_batch, find_peaks,
)
from hyperpose_tpu.utils.topology import COCO_TOPOLOGY


def make_synthetic_maps(people, h=46, w=54, n_parts=18, n_limbs=19, sigma=1.5):
    """Paint Gaussian blobs at keypoints and unit vectors along limbs.

    `people` is a list of dicts {part_idx: (x, y)} in feature-map coords.
    """
    conf = np.zeros((h, w, n_parts + 1), np.float32)
    paf = np.zeros((h, w, 2 * n_limbs), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for person in people:
        for p, (x, y) in person.items():
            blob = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma**2))
            conf[:, :, p] = np.maximum(conf[:, :, p], blob)
        for l, (a, b) in enumerate(COCO_TOPOLOGY.limbs):
            a, b = int(a), int(b)
            if a not in person or b not in person:
                continue
            ax, ay = person[a]
            bx, by = person[b]
            vec = np.array([bx - ax, by - ay], np.float32)
            norm = np.linalg.norm(vec)
            if norm < 1e-6:
                continue
            unit = vec / norm
            # distance from each pixel to the segment
            px = xs - ax
            py = ys - ay
            t = np.clip((px * vec[0] + py * vec[1]) / (norm**2), 0, 1)
            dx = px - t * vec[0]
            dy = py - t * vec[1]
            on_limb = (dx**2 + dy**2) < 2.0**2
            paf[:, :, 2 * l] = np.where(on_limb, unit[0], paf[:, :, 2 * l])
            paf[:, :, 2 * l + 1] = np.where(on_limb, unit[1], paf[:, :, 2 * l + 1])
    conf[:, :, n_parts] = 1.0 - conf[:, :, :n_parts].max(-1)
    return conf, paf


TWO_PEOPLE = [
    # A full-ish person on the left.
    {0: (10, 6), 1: (10, 12), 2: (6, 12), 3: (5, 18), 4: (5, 24),
     5: (14, 12), 6: (15, 18), 7: (15, 24), 8: (8, 24), 9: (8, 32),
     10: (8, 40), 11: (12, 24), 12: (12, 32), 13: (12, 40),
     14: (9, 5), 15: (11, 5), 16: (8, 6), 17: (12, 6)},
    # A second person on the right (upper body).
    {0: (40, 8), 1: (40, 14), 2: (36, 14), 3: (35, 20), 4: (35, 26),
     5: (44, 14), 6: (45, 20), 7: (45, 26), 8: (38, 26), 11: (42, 26)},
]


def test_find_peaks_locates_blobs():
    conf, _ = make_synthetic_maps(TWO_PEOPLE)
    cfg = PafDecoderConfig()
    import jax.numpy as jnp

    xy, score, valid = find_peaks(jnp.asarray(conf[None, ..., :18]), cfg)
    xy, score, valid = map(np.asarray, (xy, score, valid))
    # part 0 (nose): two peaks at (10,6) and (40,8), sub-pixel refined
    nose_peaks = [tuple(xy[0, 0, i]) for i in range(valid.shape[2]) if valid[0, 0, i]]
    assert len(nose_peaks) == 2
    assert any(abs(x - 10) < 0.6 and abs(y - 6) < 0.6 for x, y in nose_peaks)
    assert any(abs(x - 40) < 0.6 and abs(y - 8) < 0.6 for x, y in nose_peaks)


def test_decode_two_people():
    conf, paf = make_synthetic_maps(TWO_PEOPLE)
    cfg = PafDecoderConfig()
    out = paf_decode_batch(
        np.asarray(conf[None]), np.asarray(paf[None]), cfg, feat_hw=(46, 54)
    )
    assert isinstance(out, DecodedSkeletons)
    valid = np.asarray(out.valid[0])
    assert valid.sum() == 2, f"expected 2 humans, got {valid.sum()}"

    coords = np.asarray(out.coords[0])
    pvalid = np.asarray(out.part_valid[0])
    h, w = 46, 54
    found = []
    for hid in np.nonzero(valid)[0]:
        person = {
            p: (coords[hid, p, 0] * w, coords[hid, p, 1] * h)
            for p in np.nonzero(pvalid[hid])[0]
        }
        found.append(person)
    # Match decoded people to ground truth by nose position.
    for gt in TWO_PEOPLE:
        best = min(
            found,
            key=lambda f: abs(f.get(0, (99, 99))[0] - gt[0][0]),
        )
        n_match = 0
        for p, (x, y) in gt.items():
            if p in best:
                fx, fy = best[p]
                if abs(fx - x) <= 2 and abs(fy - y) <= 2:
                    n_match += 1
        assert n_match >= len(gt) - 2, f"matched {n_match}/{len(gt)} keypoints"


def test_decode_empty_maps():
    conf = np.zeros((1, 46, 54, 19), np.float32)
    paf = np.zeros((1, 46, 54, 38), np.float32)
    out = paf_decode_batch(conf, paf, PafDecoderConfig(), feat_hw=(46, 54))
    assert np.asarray(out.valid).sum() == 0


def test_decode_batched_consistency():
    conf, paf = make_synthetic_maps(TWO_PEOPLE)
    conf0 = np.zeros_like(conf)
    paf0 = np.zeros_like(paf)
    cfg = PafDecoderConfig()
    batched = paf_decode_batch(
        np.stack([conf, conf0]), np.stack([paf, paf0]), cfg, feat_hw=(46, 54)
    )
    assert np.asarray(batched.valid[0]).sum() == 2
    assert np.asarray(batched.valid[1]).sum() == 0


def test_decode_subpixel_accuracy():
    conf, paf = make_synthetic_maps(TWO_PEOPLE)
    out = paf_decode_batch(conf[None], paf[None], PafDecoderConfig(), feat_hw=(46, 54))
    assert np.asarray(out.valid[0]).sum() == 2
    coords = np.asarray(out.coords[0])
    pvalid = np.asarray(out.part_valid[0])
    # person 1 nose at (10, 6): decoded normalized coord * size should land
    # within half a pixel (pixel-center convention adds 0.5)
    hits = []
    for hid in range(coords.shape[0]):
        if pvalid[hid, 0]:
            hits.append((coords[hid, 0, 0] * 54, coords[hid, 0, 1] * 46))
    assert any(abs(x - 10.5) < 0.5 and abs(y - 6.5) < 0.5 for x, y in hits)


def test_pallas_peak_kernel_matches_xla():
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA front end."""
    import jax.numpy as jnp

    from hyperpose_tpu.ops.image import (
        gaussian_smooth_nhwc, same_max_pool_3x3_nhwc,
    )
    from hyperpose_tpu.ops.pallas.peak_kernel import fused_peak_candidates

    conf, _ = make_synthetic_maps(TWO_PEOPLE)
    x = jnp.asarray(conf[None, ..., :18])
    ranked, sm = fused_peak_candidates(x, interpret=True)
    sm_x = gaussian_smooth_nhwc(x, 5, 0.75)
    # Interior smoothed values agree (borders differ: zero vs reflect pad).
    smk = np.asarray(sm).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        smk[:, 3:-3, 3:-3], np.asarray(sm_x)[:, 3:-3, 3:-3], atol=1e-5
    )
    # Peaks (well inside the interior for these maps) match the XLA NMS.
    pooled = same_max_pool_3x3_nhwc(sm_x)
    is_peak_x = np.asarray((sm_x >= pooled) & (sm_x > 0.05))
    is_peak_k = np.asarray(ranked).transpose(0, 2, 3, 1) > -1e29
    inner = np.s_[:, 3:-3, 3:-3, :]
    # kernel applies the tie-break; XLA baseline here does not, so kernel
    # peaks must be a subset and cover every isolated XLA peak
    assert (is_peak_k[inner] <= is_peak_x[inner]).all()
    assert is_peak_k.sum() >= 2  # both noses found
