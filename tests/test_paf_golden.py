"""Cross-validation: vectorized device decoder vs sequential golden model.

Both consume the SAME peak set (the device peak finder's output), so any
disagreement isolates the connection-scoring / greedy / assembly stages.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from golden_paf import golden_decode
from hyperpose_tpu.ops import paf_decode as D
from hyperpose_tpu.utils.topology import COCO_TOPOLOGY
from test_paf_decode import make_synthetic_maps, TWO_PEOPLE


def random_scene(rng, n_people):
    people = []
    for _ in range(n_people):
        cx, cy = rng.uniform(10, 44), rng.uniform(8, 20)
        person = {}
        for k in range(18):
            person[k] = (
                float(np.clip(cx + rng.uniform(-7, 7), 1, 52)),
                float(np.clip(cy + rng.uniform(-4, 22), 1, 44)),
            )
        people.append(person)
    return people


def decode_both(conf, paf, cfg):
    import jax

    peak_xy, peak_score, peak_valid = jax.jit(
        D.find_peaks, static_argnames=("cfg",)
    )(jnp.asarray(conf[None, ..., :18]), cfg)
    pxy = np.asarray(peak_xy[0])
    psc = np.asarray(peak_score[0])
    pva = np.asarray(peak_valid[0])

    golden = golden_decode(pxy, psc, pva, paf, cfg)

    out = D.paf_decode_batch(conf[None], paf[None], cfg)
    device = []
    coords = np.asarray(out.coords[0])
    pvalid = np.asarray(out.part_valid[0])
    scores = np.asarray(out.scores[0])
    for hid in np.nonzero(np.asarray(out.valid[0]))[0]:
        parts = {
            int(p): (coords[hid, p, 0] * 54 - 0.5, coords[hid, p, 1] * 46 - 0.5)
            for p in np.nonzero(pvalid[hid])[0]
        }
        device.append({"parts": parts, "score": float(scores[hid])})
    return golden, device


@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 2), (2, 3), (3, 2)])
def test_device_decoder_matches_golden(seed, n_people):
    rng = np.random.default_rng(seed)
    people = random_scene(rng, n_people)
    conf, paf = make_synthetic_maps(people)
    cfg = D.PafDecoderConfig()
    golden, device = decode_both(conf, paf, cfg)

    assert len(device) == len(golden), (
        f"human count: device {len(device)} vs golden {len(golden)}"
    )
    # match each golden human to the device human with max part overlap
    def overlap(g, d):
        n = 0
        for p, (gx, gy, _) in g["parts"].items():
            if p in d["parts"]:
                dx, dy = d["parts"][p]
                if abs(dx - gx) <= 1.5 and abs(dy - gy) <= 1.5:
                    n += 1
        return n

    for g in golden:
        gp = g["parts"]
        matched = max(overlap(g, d) for d in device)
        assert matched == len(gp), (
            f"golden human with {len(gp)} parts matched only {matched}"
        )


def test_golden_on_known_scene():
    conf, paf = make_synthetic_maps(TWO_PEOPLE)
    cfg = D.PafDecoderConfig()
    golden, device = decode_both(conf, paf, cfg)
    assert len(golden) == 2
    assert len(device) == 2
