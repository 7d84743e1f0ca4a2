#!/usr/bin/env python
"""int8 serving benchmark: TinyVGG fwd+decode, bf16 vs symmetric int8.

The quantized path runs every conv as s8 x s8 -> s32 on the MXU
(hyperpose_tpu/quant.py; reference analog: int8 TFLite export,
export_tflite.py:29-41). Same chained-loop honest timing as bench.py.
Prints one JSON line per mode.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperpose_tpu import quant
from hyperpose_tpu.models import backbones as B
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.ops.paf_decode import PafDecoderConfig, paf_decode_batch

REF_FPS = 124.925  # reference TinyVGG row (README.md Performance table)


def bench_apply(name, apply_fn, v, x0, batch, steps=10):
    cfg = PafDecoderConfig()

    @jax.jit
    def loop(v, x0):
        def body(_, carry):
            x, acc = carry
            out = apply_fn(v, x, train=False)
            d = paf_decode_batch(
                out["conf_map"].astype(jnp.float32),
                out["paf_map"].astype(jnp.float32), cfg,
            )
            acc = acc + jnp.sum(d.scores)
            return x + (acc * 1e-24).astype(x.dtype), acc

        return lax.fori_loop(0, steps, body, (x0, jnp.float32(0)))[1]

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
        "vs_baseline": round(fps / REF_FPS, 3),
        "detail": {"batch": batch, "compile_s": round(compile_s, 1)},
    }), flush=True)
    return fps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hw = (368, 432)
    model = LightWeightOpenPose(backbone=B.VggTiny, dtype=jnp.bfloat16)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.bfloat16),
        train=False,
    )
    x0 = jnp.asarray(
        np.random.rand(batch, *hw, 3).astype(np.float32), jnp.bfloat16
    )
    scales = quant.calibrate(model, v, [x0], train=False)
    bench_apply("lwopenpose_tinyvgg_432x368_bf16", model.apply, v, x0, batch)
    bench_apply(
        "lwopenpose_tinyvgg_432x368_int8",
        quant.quantized_apply(model, scales), v, x0, batch,
    )


if __name__ == "__main__":
    main()
