#!/usr/bin/env python
"""Generate the unlabeled domain-shifted split for the domain-adaptation
convergence demo (reference wiring: hyperpose/Model/train.py:230-295
trains a discriminator on backbone features of labeled vs unlabeled
images).

Scenes come from the SAME procedural scene model as the labeled benchmark
(disjoint seed range: indices >= 2*10**6) but rendered through a strong
appearance shift — channel rotation, gamma, vignette, hue-correlated
noise — so the unlabeled domain looks systematically different while
containing the same pose content. Annotations are discarded (unlabeled).

  python scripts/gen_dmadapt_data.py --out ./data_dmadapt --n 256
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def style_shift(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Deterministic per-image appearance shift."""
    x = img.astype(np.float32) / 255.0
    x = x[..., [2, 0, 1]]                      # channel rotation
    x = x ** 0.55                              # gamma lift
    h, w = x.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy = w / 2, h / 2
    r = np.sqrt(((xx - cx) / cx) ** 2 + ((yy - cy) / cy) ** 2)
    x *= (1.0 - 0.45 * np.clip(r, 0, 1) ** 2)[..., None]   # vignette
    x += rng.normal(0, 0.03, x.shape)          # sensor noise
    x[..., 2] = np.clip(x[..., 2] * 1.2 + 0.05, 0, 1)  # blue cast
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./data_dmadapt")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hw", default="368x432")
    args = ap.parse_args()

    import cv2

    from hyperpose_tpu.data.synthetic import render_scene

    hw = tuple(int(v) for v in args.hw.lower().split("x"))
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.n):
        rng = np.random.default_rng(args.seed * 2**30 + 2 * 10**6 + i)
        img, _, _ = render_scene(rng, hw)
        img = style_shift(img, rng)
        cv2.imwrite(
            os.path.join(args.out, f"dm_{i:06d}.jpg"),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 92],
        )
    print(f"wrote {args.n} unlabeled domain-shifted frames to {args.out}")


if __name__ == "__main__":
    main()
