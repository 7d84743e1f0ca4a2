#!/usr/bin/env python
"""Whole-zoo benchmark: every reference performance-table row, fwd+decode.

Prints one JSON line per config (reference rows: README.md Performance
table / docs/markdown/performance/prediction.md). Same chained-loop honest
timing as bench.py.
"""
import json
import os
import sys
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu.models import backbones as B
from hyperpose_tpu.models.openpose import LightWeightOpenPose, OpenPose
from hyperpose_tpu.models.pifpaf import Pifpaf
from hyperpose_tpu.models.pose_proposal import PoseProposal
from hyperpose_tpu.ops.paf_decode import PafDecoderConfig, paf_decode_batch
from hyperpose_tpu.ops.pifpaf_decode import (
    PifPafDecoderConfig, pifpaf_decode_batch,
)
from hyperpose_tpu.ops.ppn_decode import PpnDecoderConfig, ppn_decode_batch

def provenance() -> dict:
    """Commit + date stamp so every recorded row is attributable
    (VERDICT r2 #9: no un-dated benchmark rows)."""
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    return {"commit": commit,
            "date": datetime.date.today().isoformat()}


ROWS = [
    # (name, builder, hw, reference fps)
    ("openpose_vgg19_656x368", lambda: OpenPose(dtype=jnp.bfloat16),
     (368, 656), 27.32),
    ("lwopenpose_tinyvgg_384x256",
     lambda: LightWeightOpenPose(backbone=B.VggTiny, dtype=jnp.bfloat16),
     (256, 384), 124.925),
    ("lwopenpose_tinyvgg_432x368",
     lambda: LightWeightOpenPose(backbone=B.VggTiny, dtype=jnp.bfloat16),
     (368, 432), 124.925),
    # TPU-native space-to-depth TinyVGG variant (same capacity/stride;
    # baseline column reuses the reference TinyVGG figure)
    ("lwopenpose_tinyvgg_s2d_432x368",
     lambda: LightWeightOpenPose(backbone=B.VggTinyS2D, dtype=jnp.bfloat16),
     (368, 432), 124.925),
    ("lwopenpose_mobilenet_432x368",
     lambda: LightWeightOpenPose(dtype=jnp.bfloat16), (368, 432), 84.32),
    ("lwopenpose_resnet18_432x368",
     lambda: LightWeightOpenPose(backbone=B.Resnet18, dtype=jnp.bfloat16),
     (368, 432), 62.52),
    ("pifpaf_resnet50_432x368",
     lambda: Pifpaf(hin=368, win=432, dtype=jnp.bfloat16), (368, 432), 44.16),
    ("poseproposal_resnet18_384x384",
     lambda: PoseProposal(hin=384, win=384, dtype=jnp.bfloat16),
     (384, 384), None),
]


def fused_step(name, model):
    if "pifpaf" in name:
        cfg = PifPafDecoderConfig()

        def step(v, x):
            out = model.apply(v, x, train=False)
            return pifpaf_decode_batch(
                out, cfg, 8, (model.hin, model.win)
            ).scores
    elif "poseproposal" in name:
        cfg = PpnDecoderConfig()

        def step(v, x):
            out = model.apply(v, x, train=False)
            hout, wout = out["c"].shape[1], out["c"].shape[2]
            rx, ry, rw, rh = model.restore_coor(
                out["x"], out["y"], out["w"], out["h"], hout, wout
            )
            pred = dict(out, x=rx, y=ry, w=rw, h=rh)
            pred = {k: pred[k] for k in ("c", "i", "x", "y", "w", "h", "e")}
            return ppn_decode_batch(
                pred, cfg, 9, 9, (model.hin, model.win)
            ).scores
    else:
        cfg = PafDecoderConfig()

        def step(v, x):
            out = model.apply(v, x, train=False)
            return paf_decode_batch(
                out["conf_map"].astype(jnp.float32),
                out["paf_map"].astype(jnp.float32), cfg,
            ).scores
    return step


def bench_one(name, builder, hw, ref_fps, batch=8, steps=100):
    model = builder()
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.bfloat16),
        train=False,
    )
    step = fused_step(name, model)

    @jax.jit
    def loop(v, x0):
        def body(_, carry):
            x, acc = carry
            acc = acc + jnp.sum(step(v, x))
            return x + (acc * 1e-24).astype(x.dtype), acc

        return lax.fori_loop(0, steps, body, (x0, jnp.float32(0)))[1]

    x0 = jnp.asarray(
        np.random.rand(batch, *hw, 3).astype(np.float32), jnp.bfloat16
    )
    t0 = time.perf_counter()
    float(loop(v, x0))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(v, x0))
        best = min(best, time.perf_counter() - t0)
    fps = batch * steps / best
    print(json.dumps({
        "metric": name, "value": round(fps, 2), "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 3) if ref_fps else None,
        "detail": {"batch": batch, "compile_s": round(compile_s, 1),
                   **provenance()},
    }), flush=True)
    return fps


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("BENCH_BATCH", "8"))
    for name, builder, hw, ref in ROWS:
        if only and only not in name:
            continue
        try:
            bench_one(name, builder, hw, ref, batch=batch)
        except Exception as e:  # keep the sweep alive
            print(json.dumps({"metric": name, "error": str(e)[:200]}),
                  flush=True)
