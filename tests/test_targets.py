"""Target-map generation: device implementation vs reference-semantics numpy."""
import numpy as np

from hyperpose_tpu.data.augment import MISSING, BasicAugmentor
from hyperpose_tpu.data.targets import openpose_conf_map, openpose_paf_map
from hyperpose_tpu.utils.topology import COCO_LIMBS, COCO_FLIP_LIST


def ref_conf_map(kpts_list, hin, win, hout, wout, n_parts=18, sigma=7.0):
    """Direct transcription of the reference put_heatmap semantics
    (reference: openpose/utils.py:55-86)."""
    heat = np.zeros((n_parts + 1, hout, wout), np.float32)
    stride = hin / hout
    offset = stride / 2 - 0.5
    y = np.arange(hout) * stride + offset
    x = np.arange(wout) * stride + offset
    for person in kpts_list:
        for p, (cx, cy) in enumerate(person):
            if cx < 0 or cy < 0:
                continue
            yv2 = (y - cy) ** 2
            xv2 = (x - cx) ** 2
            arg = (xv2[None, :] + yv2[:, None]) / (2 * sigma * sigma)
            g = np.exp(-arg)
            g[arg > 4.6052] = 0
            heat[p] = np.maximum(heat[p], g)
    heat[-1] = np.clip(1 - heat[:-1].max(0), 0, 1)
    return heat.transpose(1, 2, 0)


def test_conf_map_matches_reference_semantics(rng):
    hin, win, hout, wout = 368, 432, 46, 54
    n_people, n_parts = 3, 18
    kpts = rng.uniform(0, 360, (1, n_people, n_parts, 2)).astype(np.float32)
    valid = rng.random((1, n_people, n_parts)) > 0.3
    kpts_masked = np.where(valid[..., None], kpts, -1000)

    got = np.asarray(openpose_conf_map(
        kpts_masked, valid, (hin, win), (hout, wout)
    ))[0]
    want = ref_conf_map(
        [kpts_masked[0, m] for m in range(n_people)], hin, win, hout, wout
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_paf_map_basic_band():
    hin, win, hout, wout = 368, 432, 46, 54
    # One person, one vertical limb from (100, 50) to (100, 250) input px.
    kpts = np.full((1, 1, 19, 2), -1000, np.float32)
    valid = np.zeros((1, 1, 19), bool)
    # limb 0 of COCO_LIMBS is (1, 8)
    kpts[0, 0, 1] = (100, 50)
    kpts[0, 0, 8] = (100, 250)
    valid[0, 0, 1] = valid[0, 0, 8] = True

    paf = np.asarray(openpose_paf_map(
        kpts, valid, COCO_LIMBS, (hin, win), (hout, wout)
    ))[0]
    # Unit vector should be (0, +1) inside the band.
    gx = int(round(100 / 8))
    mid_y = int(round(150 / 8))
    assert abs(paf[mid_y, gx, 0]) < 1e-6
    assert paf[mid_y, gx, 1] == 1.0
    # Outside the band: zero.
    assert paf[mid_y, gx + 5, 1] == 0.0
    # Other limb channels untouched.
    assert np.abs(paf[:, :, 2:]).max() == 0.0


def test_paf_count_normalization():
    hin, win, hout, wout = 368, 432, 46, 54
    # Two people with identical overlapping limb: normalized magnitude 1.
    kpts = np.full((1, 2, 19, 2), -1000, np.float32)
    valid = np.zeros((1, 2, 19), bool)
    for m in range(2):
        kpts[0, m, 1] = (100, 50)
        kpts[0, m, 8] = (100, 250)
        valid[0, m, 1] = valid[0, m, 8] = True
    paf = np.asarray(openpose_paf_map(
        kpts, valid, COCO_LIMBS, (hin, win), (hout, wout)
    ))[0]
    mid_y, gx = int(round(150 / 8)), int(round(100 / 8))
    assert abs(paf[mid_y, gx, 1] - 1.0) < 1e-6


def test_augmentor_keypoints_follow_image(rng):
    aug = BasicAugmentor(
        hin=128, win=160, flip_list=COCO_FLIP_LIST,
        rng=np.random.default_rng(3),
    )
    image = np.zeros((240, 320, 3), np.uint8)
    # Draw a distinctive dot at the keypoint location.
    image[118:122, 158:162] = 255
    kpts = np.full((1, 19, 2), MISSING, np.float32)
    valid = np.zeros((1, 19), bool)
    kpts[0, 0] = (160, 120)
    valid[0, 0] = True
    for _ in range(5):
        out = aug.process(image, kpts, valid)
        assert out.image.shape == (128, 160, 3)
        assert out.mask.shape == (128, 160)
        if out.valid[0, 0]:
            x, y = out.kpts[0, 0]
            # The white dot must be near the transformed keypoint.
            x0, y0 = int(round(x)), int(round(y))
            window = out.image[
                max(y0 - 4, 0):y0 + 5, max(x0 - 4, 0):x0 + 5
            ]
            assert window.max() > 100, "keypoint lost the white dot"


def test_augmentor_only_image():
    aug = BasicAugmentor(hin=64, win=96, rng=np.random.default_rng(0))
    out = aug.process_only_image(np.zeros((100, 150, 3), np.uint8))
    assert out.shape == (64, 96, 3)
