#!/usr/bin/env python
"""Deterministically recreate the flagship TinyVGG checkpoint + ACCURACY row.

Runs the documented ACCURACY.md recipe (LW-OpenPose TinyVGG, 432x368,
b16, lr 5e-4, 28k steps) in resumable segments (the axon tunnel leaks
host memory per transfer — see .claude/skills/verify/SKILL.md; real
TPU-VM runs can use --segment_steps equal to --n_step), evaluates on the
100-scene val protocol, and publishes the weights to
weights/flagship_tinyvgg.npz — the file tests/test_tl_roundtrip.py and
bench_stream.py consume, so every trained stream/accuracy row is
re-creatable from a fresh checkout with this one script.

  python scripts/retrain_flagship.py            # full 28k recipe
  python scripts/retrain_flagship.py --quick    # 12k (~30 min): AP ~0.65
"""
import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_step", type=int, default=28000)
    ap.add_argument("--quick", action="store_true",
                    help="12k steps (~30 min on a v5e chip)")
    ap.add_argument("--segment_steps", type=int, default=7000)
    ap.add_argument("--model_name", default="synth_tinyvgg_flagship")
    ap.add_argument("--skip_eval", action="store_true")
    args = ap.parse_args()
    total = 12000 if args.quick else args.n_step

    base = [
        sys.executable, os.path.join(REPO, "train.py"), "--synthetic",
        "--model_type", "LightweightOpenpose",
        "--model_backbone", "Vggtiny",
        "--model_name", args.model_name,
        "--batch_size", "16", "--lr_init", "5e-4",
    ]
    milestones = list(range(args.segment_steps, total, args.segment_steps))
    milestones.append(total)
    for n in milestones:
        print(f"== training segment -> step {n}/{total} ==", flush=True)
        subprocess.run(base + ["--n_step", str(n)], check=True, cwd=REPO)

    model_dir = os.path.join(REPO, "save_dir", args.model_name, "model_dir")
    npz = os.path.join(model_dir, "newest_model.npz")
    assert os.path.exists(npz), f"training did not produce {npz}"
    out = os.path.join(REPO, "weights", "flagship_tinyvgg.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    shutil.copyfile(npz, out)
    print(f"published {out}")

    if not args.skip_eval:
        subprocess.run([
            sys.executable, os.path.join(REPO, "eval.py"), "--synthetic",
            "--model_type", "LightweightOpenpose",
            "--model_backbone", "Vggtiny",
            "--model_name", args.model_name,
        ], check=True, cwd=REPO)


if __name__ == "__main__":
    main()
