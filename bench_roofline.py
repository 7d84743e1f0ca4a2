#!/usr/bin/env python
"""Roofline placement of every zoo forward pass on this chip.

For each model: analytic FLOPs + HBM bytes from XLA cost analysis
(utils/export.measure_flops; reference analog: measure_flops.py), measured
fwd-only fps with the chained-loop harness, and the achieved TFLOP/s / GB/s
against the chip roofline. Prints one JSON line per row.

TPU v5e peaks: ~197 TFLOP/s bf16, ~819 GB/s HBM. A row is compute-bound when
(flops/bytes) > (197e12/819e9) ~ 240 flops/byte.
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

from hyperpose_tpu.utils.export import measure_flops
from bench_all import ROWS

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def bench_forward(model, hw, batch=8, steps=100):
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.bfloat16),
        train=False,
    )

    def fwd(v, x):
        out = model.apply(v, x, train=False)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    @jax.jit
    def loop(v, x0):
        def body(_, carry):
            x, acc = carry
            acc = acc + fwd(v, x)
            return x + (acc * 1e-24).astype(x.dtype), acc

        return lax.fori_loop(0, steps, body, (x0, jnp.float32(0)))[1]

    x0 = jnp.asarray(
        np.random.rand(batch, *hw, 3).astype(np.float32), jnp.bfloat16
    )
    cost = measure_flops(lambda v, x: fwd(v, x), v, x0)
    float(loop(v, x0))  # compile + first
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(v, x0))
        best = min(best, time.perf_counter() - t0)
    sec_per_batch = best / steps
    return {
        "fps": batch * steps / best,
        "gflops_per_frame": cost["flops"] / batch / 1e9,
        "mbytes_per_frame": cost["bytes_accessed"] / batch / 1e6,
        "achieved_tflops": cost["flops"] / sec_per_batch / 1e12,
        "achieved_gbs": cost["bytes_accessed"] / sec_per_batch / 1e9,
    }


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, builder, hw, _ in ROWS:
        if only and only not in name:
            continue
        try:
            r = bench_forward(builder(), hw)
            intensity = (
                r["gflops_per_frame"] * 1e3 / r["mbytes_per_frame"]
            )  # flops/byte
            bound = "compute" if intensity > PEAK_TFLOPS * 1e3 / PEAK_GBS \
                else "bandwidth"
            print(json.dumps({
                "metric": f"roofline_{name}",
                "value": round(r["achieved_tflops"], 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(r["achieved_tflops"] / PEAK_TFLOPS, 3),
                "detail": {
                    "fwd_fps": round(r["fps"], 1),
                    "gflops_per_frame": round(r["gflops_per_frame"], 2),
                    "mbytes_per_frame": round(r["mbytes_per_frame"], 1),
                    "flops_per_byte": round(intensity, 1),
                    "hbm_gbs": round(r["achieved_gbs"], 1),
                    "hbm_frac": round(r["achieved_gbs"] / PEAK_GBS, 3),
                    "bound": bound,
                },
            }), flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"roofline_{name}",
                              "error": str(e)[:200]}), flush=True)
