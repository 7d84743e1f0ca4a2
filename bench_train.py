#!/usr/bin/env python
"""Training-throughput benchmark: fused (on-device targets + fwd + bwd +
update) steps/s for TinyVGG LightWeight-OpenPose at 432x368.

The reference trains this class of model in 1-2 weeks on a V100 DGX
(reference: README.md Accuracy section); this measures our per-chip
training rate with the same honest chained-timing methodology as bench.py.
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
import optax
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu.data.targets import openpose_targets
from hyperpose_tpu.models.backbones import VggTiny
from hyperpose_tpu.models.openpose import LightWeightOpenPose, openpose_loss
from hyperpose_tpu.utils.topology import COCO_LIMBS


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    hw, out_hw = (368, 432), (46, 54)

    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.bfloat16),
        train=True,
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    limbs = np.asarray(COCO_LIMBS)

    def one_step(params, stats, opt_state, images, kpts, valid):
        targets = openpose_targets(kpts, valid, limbs, hw, out_hw)

        def loss_fn(p):
            x = images.astype(model.dtype) / 255.0
            out, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss, _ = openpose_loss(
                out, targets["conf_map"], targets["paf_map"]
            )
            return loss, upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def loop(params, stats, opt_state, images, kpts, valid):
        def body(_, carry):
            params, stats, opt_state, acc = carry
            params, stats, opt_state, loss = one_step(
                params, stats, opt_state, images, kpts, valid
            )
            return params, stats, opt_state, acc + loss

        out = lax.fori_loop(
            0, steps, body, (params, stats, opt_state, jnp.float32(0))
        )
        return out[3]

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, *hw, 3)).astype(np.uint8)
    )
    kpts = jnp.asarray(rng.uniform(0, 360, (batch, 8, 18, 2)).astype(np.float32))
    valid = jnp.asarray(rng.random((batch, 8, 18)) > 0.3)

    t0 = time.perf_counter()
    float(loop(params, stats, opt_state, images, kpts, valid))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, stats, opt_state, images, kpts, valid))
        best = min(best, time.perf_counter() - t0)

    sps = steps / best
    print(json.dumps({
        "metric": "tinyvgg_openpose_train_step_432x368",
        "value": round(sps, 2), "unit": "steps/s",
        "vs_baseline": None,
        "detail": {
            "batch": batch, "images_per_sec": round(sps * batch, 1),
            "ms_per_step": round(1000 * best / steps, 1),
            "compile_s": round(compile_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
