"""Pinned oracle outputs for the randomized PifPaf golden test.

The sequential reference transcription (golden_pifpaf.py) costs ~5-40 s
per scene in numpy — far too slow to run for 32 scenes in CI — but it is
a DETERMINISTIC function of the scene fields, which are themselves a
deterministic function of the seed. So its outputs are pinned here as a
JSON fixture: the test regenerates the identical scenes from the seed,
runs only the fast on-device decoder, and matches against the pinned
oracle humans. `test_two_people_fixture_agrees` still runs the live
oracle on a small scene so the transcription itself stays exercised.

Regenerate (after intentionally changing the oracle or scene recipe):

    cd tests && python golden_pifpaf_fixture.py

TEST ORACLE DATA ONLY — never imported by the package.
"""
import json
import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "pifpaf_golden_oracle.json")
N_SCENES = 32
N_SPARSE = 24
SEED = 42


def golden_scenes(random_scene, rng=None):
    """Yield (scene_idx, crowded, fields) with the pinned draw order."""
    rng = rng or np.random.default_rng(SEED)
    for s in range(N_SCENES):
        crowded = s >= N_SPARSE
        n_people = int(rng.integers(6, 9) if crowded else rng.integers(1, 4))
        yield s, crowded, random_scene(rng, n_people=n_people)


def load_oracle():
    with open(FIXTURE) as f:
        raw = json.load(f)
    # JSON keys are strings; restore int part ids.
    return [
        [{int(k): tuple(v) for k, v in human.items()} for human in scene]
        for scene in raw["scenes"]
    ]


def main():
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))
    from golden_pifpaf import reference_pifpaf_decode
    from test_pifpaf_golden import (
        FEAT_HW, random_scene, to_oracle_layout,
    )

    import jax

    from hyperpose_tpu.ops.pifpaf_decode import restore_maps
    from hyperpose_tpu.utils.topology import PIFPAF_TOPOLOGY

    limbs = np.asarray(PIFPAF_TOPOLOGY.limbs)
    scenes = []
    for s, crowded, fields in golden_scenes(random_scene):
        restored = jax.jit(restore_maps, static_argnames="stride")(
            fields, stride=8
        )
        oracle = reference_pifpaf_decode(to_oracle_layout(restored), limbs)
        scenes.append([
            {str(k): [float(v[0]), float(v[1]), float(v[2])]
             for k, v in human.items()}
            for human in oracle
        ])
        print(f"scene {s}: crowded={crowded} humans={len(oracle)}")
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump({"seed": SEED, "n_scenes": N_SCENES, "scenes": scenes}, f)
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main()
