#!/usr/bin/env python
"""Sweep PoseProposal decode thresholds on a held-out tune split.

The PPN parser's thresholds (part score, edge score, NMS IoU, min parts)
are eval-protocol constants in the reference (reference:
hyperpose/Model/pose_proposal/processor.py:36-42 hard-codes them). A net
trained with MSE response losses is systematically under-confident
relative to painted targets, so the painted-ceiling thresholds are not
the trained-model optimum. This script picks the operating point on a
TUNE split — freshly rendered scenes just beyond the dataset's training
range (per-scene seeding makes scene i deterministic regardless of
n_train), disjoint from both the trained scenes and the 100-scene val
protocol — so the reported val row stays honest.

Forward runs ONCE per image; the sweep re-decodes cached maps, so adding
grid points costs only (small) decode time.

Usage:
  JAX_PLATFORMS=cpu python scripts/tune_ppn_decode.py \
      --weights save_dir/synth_ppn_r4/model_dir/newest_model.npz \
      [--n_tune 100] [--final_val]
"""
import argparse
import dataclasses
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# This environment pre-imports jax with the TPU plugin, so env-var platform
# selection is too late (see tests/conftest.py) — force CPU in-process and
# reuse the suite's persistent compile cache (72 decode variants compile).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--n_tune", type=int, default=100)
    ap.add_argument("--dataset_path", default="./data_synth")
    ap.add_argument("--tune_offset", type=int, default=None,
                    help="first scene index of the held-out tune split; "
                         "defaults to the dataset's n_train (i.e. the tail "
                         "just beyond the training range — per-scene seeding "
                         "makes those exactly the scenes a longer train "
                         "split would have continued with)")
    ap.add_argument("--final_val", action="store_true",
                    help="after the sweep, score the best config on the "
                         "100-scene val protocol")
    ap.add_argument("--smoke", action="store_true",
                    help="2-point grid, for a fast plumbing check")
    ap.add_argument("--out", default=None,
                    help="write the best config as JSON to this path "
                         "(consumed by eval.py --ppn_decoder via "
                         "scripts/r5 queue automation)")
    args = ap.parse_args()

    from hyperpose_tpu import config as Config
    from hyperpose_tpu.data.synthetic import ensure_synthetic_dataset

    Config.set_model_name("synth_ppn_tune")
    Config.set_model_type(Config.MODEL.PoseProposal)
    Config.set_model_backbone(Config.BACKBONE.Resnet18)
    Config.set_dataset_type(Config.DATA.MSCOCO)
    root = ensure_synthetic_dataset(args.dataset_path)
    Config.set_dataset_path(root)
    config = Config.get_config(create_dirs=False)

    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import models as Model
    from hyperpose_tpu.data.base import EvalRecord, get_dataset
    from hyperpose_tpu.eval.coco_eval import CocoKeypointEval
    from hyperpose_tpu.eval.evaluate import Evaluator
    from hyperpose_tpu.ops.ppn_decode import PpnDecoderConfig, ppn_decode_batch
    from hyperpose_tpu.train.checkpoint import load_weights_npz
    from hyperpose_tpu.utils.human import SkeletonBatch
    from hyperpose_tpu.utils.topology import instance_part_idx

    model = Model.get_model(config)
    dataset = get_dataset(config)
    topo = Model.get_topology(config)
    m = config.model

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, m.hin, m.win, 3)), train=False
    )
    variables = load_weights_npz(variables, args.weights)
    print(f"loaded {args.weights}")

    # TUNE split: HELD-OUT scenes beyond the training range (disjoint from
    # both the trained scenes and val2017). Per-scene seeding means scene
    # indices [n_train, n_train + n_tune) are exactly the scenes a longer
    # train split would have continued with; rendering them into a sibling
    # dir gives an out-of-sample tune split (round-4 data showed in-sample
    # tuning reads ~+0.09 AP optimistic on memorized runs).
    import copy

    from hyperpose_tpu.data.synthetic import generate_synthetic_coco

    with open(os.path.join(root, ".synthetic_meta.json")) as f:
        ds_meta = json.load(f)
    offset = args.tune_offset if args.tune_offset is not None \
        else ds_meta["n_train"]
    tune_root = f"{root.rstrip('/')}_tune{offset}_{args.n_tune}"
    tune_marker = os.path.join(tune_root, ".tune_meta.json")
    tune_meta = {"seed": ds_meta["seed"], "start": offset,
                 "n": args.n_tune, "rev": 2}
    regen = True
    if os.path.exists(tune_marker):
        with open(tune_marker) as f:
            regen = json.load(f) != tune_meta
    if regen:
        generate_synthetic_coco(
            tune_root, n_train=args.n_tune, n_val=0, seed=ds_meta["seed"],
            emit_mpii=False, train_start=offset,
        )
        with open(tune_marker, "w") as f:
            json.dump(tune_meta, f)
    tune_config = copy.deepcopy(config)
    tune_config.data.dataset_path = tune_root
    tune_dataset = get_dataset(tune_config)
    train_images, by_img = tune_dataset._parse_split("train")
    img_dir = tune_dataset._image_dir("train")
    tune_records = [
        EvalRecord(os.path.join(img_dir, img["file_name"]), iid)
        for iid, img in sorted(train_images.items())
        if iid in by_img
    ][: args.n_tune]
    print(f"tune split: {len(tune_records)} held-out scenes "
          f"(indices {offset}..{offset + args.n_tune - 1})")

    # Forward once, cache restored prediction maps on host.
    @jax.jit
    def forward(variables, images_u8):
        x = images_u8.astype(model.dtype) / 255.0
        out = model.apply(variables, x, train=False)
        hout, wout = out["c"].shape[1], out["c"].shape[2]
        rx, ry, rw, rh = model.restore_coor(
            out["x"], out["y"], out["w"], out["h"], hout, wout
        )
        return {"c": out["c"], "i": out["i"], "x": rx, "y": ry,
                "w": rw, "h": rh, "e": out["e"]}

    import cv2

    bs = 10
    cached, sizes = [], []
    for i in range(0, len(tune_records), bs):
        chunk = tune_records[i:i + bs]
        batch = np.zeros((bs, m.hin, m.win, 3), np.uint8)
        for j, rec in enumerate(chunk):
            img = cv2.cvtColor(cv2.imread(rec.image_path), cv2.COLOR_BGR2RGB)
            sizes.append(img.shape[:2])
            batch[j] = cv2.resize(img, (m.win, m.hin))
        pred = forward(variables, jnp.asarray(batch))
        cached.append({k: np.asarray(v) for k, v in pred.items()})
    print(f"cached {len(cached)} forward batches")

    scorer = CocoKeypointEval(tune_dataset._ann_path("train"))
    # Reuse Evaluator's ann-building (topology + converter only).
    ev = Evaluator(model, variables, dataset, (m.hin, m.win),
                   dataset.output_converter, topo, batch_size=bs)

    def score(cfg: PpnDecoderConfig, records, preds, szs, scorer):
        results = []
        for bi, pred in enumerate(preds):
            out = ppn_decode_batch(
                {k: jnp.asarray(v) for k, v in pred.items()},
                cfg=cfg, hnei=m.hnei, wnei=m.wnei, in_hw=(m.hin, m.win),
                topology=topo,
            )
            sk = SkeletonBatch(*(np.asarray(t) for t in (
                out.coords, out.part_scores, out.part_valid, out.scores,
                out.valid,
            )))
            for j in range(bs):
                gi = bi * bs + j
                if gi >= len(records):
                    break
                results.extend(ev.humans_to_coco_ann(
                    sk.to_humans(j), records[gi].image_id, szs[gi]
                ))
        return scorer.evaluate(results, verbose=False)

    base = PpnDecoderConfig(instance_part=instance_part_idx(topo))
    grid = {
        "thresh_part_score": [0.05, 0.1, 0.15, 0.2],
        "thresh_edge_score": [0.05, 0.1, 0.2],
        "thresh_nms_iou": [0.3, 0.45, 0.6],
        "min_parts": [3, 4],
    }
    if args.smoke:
        grid = {k: v[:2 if k == "thresh_part_score" else 1]
                for k, v in grid.items()}
    keys = list(grid)
    best, best_cfg = None, None
    rows = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        cfg = dataclasses.replace(base, **dict(zip(keys, combo)))
        r = score(cfg, tune_records, cached, sizes, scorer)
        rows.append({**dict(zip(keys, combo)), "AP": r["AP"], "AR": r["AR"]})
        mark = ""
        if best is None or r["AP"] > best["AP"]:
            best, best_cfg = r, cfg
            mark = "  <-- best"
        print(f"{dict(zip(keys, combo))}  AP={r['AP']:.3f} "
              f"AR={r['AR']:.3f}{mark}")

    print("\nBEST (tune split):")
    print(json.dumps({k: getattr(best_cfg, k) for k in keys}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({k: getattr(best_cfg, k) for k in keys}, f)
    print(f"AP={best['AP']:.3f} AP50={best['AP50']:.3f} "
          f"AP75={best['AP75']:.3f} AR={best['AR']:.3f}")

    if args.final_val:
        print("\n== scoring best config on the 100-scene val protocol ==")
        val_records = dataset.get_eval_records()[:100]
        vs = []
        vcached = []
        for i in range(0, len(val_records), bs):
            chunk = val_records[i:i + bs]
            batch = np.zeros((bs, m.hin, m.win, 3), np.uint8)
            for j, rec in enumerate(chunk):
                img = cv2.cvtColor(
                    cv2.imread(rec.image_path), cv2.COLOR_BGR2RGB
                )
                vs.append(img.shape[:2])
                batch[j] = cv2.resize(img, (m.win, m.hin))
            pred = forward(variables, jnp.asarray(batch))
            vcached.append({k: np.asarray(v) for k, v in pred.items()})
        vscorer = CocoKeypointEval(dataset._ann_path("val"))
        r = score(best_cfg, val_records, vcached, vs, vscorer)
        print(f"VAL: AP={r['AP']:.3f} AP50={r['AP50']:.3f} "
              f"AP75={r['AP75']:.3f} AR={r['AR']:.3f}")
        for also in [base]:
            r0 = score(also, val_records, vcached, vs, vscorer)
            print(f"VAL(default cfg): AP={r0['AP']:.3f} AR={r0['AR']:.3f}")


if __name__ == "__main__":
    main()
