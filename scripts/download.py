#!/usr/bin/env python
"""Model-zoo and dataset downloader.

(reference: scripts/downloader.py + scripts/download-*.sh — gdown-based
model-zoo fetcher with md5 verification, plus COCO/MPII dataset scripts.)

This environment has no network egress, so downloads fail fast with a clear
message; the registry below still documents every artifact (same Google
Drive ids/md5s the reference publishes) so the command works verbatim on a
connected machine.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request

# Reference model zoo (Google Drive id, md5) — same artifacts the reference
# CLI consumes (reference: scripts/downloader.py:11-22).
MODEL_ZOO = {
    "lopps-resnet50-V2-HW=368x432.onnx":
        ("1tb8jnXkoiscfr-ZVydAALg7dtUwAKdEd",
         "a6ba26d505c8150d9bf01950143d51d3"),
    "openpose-coco-V2-HW=368x656.onnx":
        ("15A0SQyPlU2W-Btcf6Ngi6DY0_1CY50d7",
         "9f422740c7d41d93d6fe16408b0274ef"),
    "openpose-thin-V2-HW=368x432.onnx":
        ("1xqXNFPJgsSjgv-AWdqnobcpRmdIu42eh",
         "65e26d62fd71dc0047c4c319fa3d9096"),
    "ppn-resnet50-V2-HW=384x384.onnx":
        ("1qMSipZ5_QMyRuNQ7ux5isNxwr678ctwG",
         "0d1df2e61c0f550185d562ec67a5f2ca"),
    "TinyVGG-V1-HW=256x384.uff":
        ("1KlKjNMaruJnNYEXQKqzHGqECBAmwB92T",
         "6551931d16e55cc9370c5c13d91383c3"),
    "openpose-mobile-HW=342x368.onnx":
        ("1eDEOC0WBB50bryAbFmhfptyGMoV5wZGn",
         "a09d901e39c4f4d913c547d614e249f9"),
    "openpifpaf-resnet50-HW=368x432.onnx":
        ("1cxT1PCPPdMxEdvSB8Q5ewxyTh_TWgcsi",
         "6c661ded88a91699a1c0582b403d5873"),
    "TinyVGG-V2-HW=342x368.onnx":
        ("1ax6fTrxItLXshyHUFTHQVKs5eTRB3t6b",
         "52933b27c41342c959f4e49499a057ad"),
}

DATASETS = {
    "mscoco2017": [
        "http://images.cocodataset.org/zips/train2017.zip",
        "http://images.cocodataset.org/zips/val2017.zip",
        "http://images.cocodataset.org/annotations/"
        "annotations_trainval2017.zip",
    ],
    "mpii": [
        "https://datasets.d2.mpi-inf.mpg.de/andriluka14cvpr/"
        "mpii_human_pose_v1.tar.gz",
        "https://datasets.d2.mpi-inf.mpg.de/andriluka14cvpr/"
        "mpii_human_pose_v1_u12_2.zip",
    ],
}


def md5sum(path: str) -> str:
    digest = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def download_model(name: str, out_dir: str) -> str:
    if name not in MODEL_ZOO:
        print(f"Unknown model: {name}. Available:")
        for key in MODEL_ZOO:
            print(f"  {key}")
        sys.exit(1)
    drive_id, md5 = MODEL_ZOO[name]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    if os.path.exists(path) and md5sum(path) == md5:
        print(f"{name}: already present, md5 OK")
        return path
    url = f"https://drive.google.com/uc?id={drive_id}&export=download"
    print(f"downloading {name} <- {url}")
    try:
        urllib.request.urlretrieve(url, path)
    except OSError as exc:
        sys.exit(
            f"download failed ({exc}). This environment may have no network "
            f"egress; run this script on a connected machine, or fetch the "
            f"file manually into {path} (md5 {md5})."
        )
    got = md5sum(path)
    if got != md5:
        sys.exit(f"md5 mismatch for {name}: got {got}, want {md5}")
    print(f"{name}: OK -> {path}")
    return path


def download_dataset(name: str, out_dir: str) -> None:
    if name not in DATASETS:
        sys.exit(f"Unknown dataset: {name}. Available: {list(DATASETS)}")
    os.makedirs(out_dir, exist_ok=True)
    for url in DATASETS[name]:
        fname = os.path.join(out_dir, url.rsplit("/", 1)[1])
        if os.path.exists(fname):
            print(f"{fname}: already present")
            continue
        print(f"downloading {url}")
        try:
            urllib.request.urlretrieve(url, fname)
        except OSError as exc:
            sys.exit(
                f"download failed ({exc}). No network egress here — fetch "
                f"{url} manually into {out_dir}."
            )
    print(f"{name}: done. Unzip archives under {out_dir} per "
          "scripts/README.md layout.")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", help="model-zoo artifact to fetch")
    parser.add_argument("--dataset", help="dataset to fetch "
                        f"({'/'.join(DATASETS)})")
    parser.add_argument("--out", default="./data/models",
                        help="output directory")
    parser.add_argument("--list", action="store_true",
                        help="list available artifacts")
    args = parser.parse_args()
    if args.list or (not args.model and not args.dataset):
        print("models:")
        for key in MODEL_ZOO:
            print(f"  {key}")
        print("datasets:", ", ".join(DATASETS))
        return
    if args.model:
        download_model(args.model, args.out)
    if args.dataset:
        download_dataset(args.dataset, args.out)


if __name__ == "__main__":
    main()
