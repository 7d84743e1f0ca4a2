#!/usr/bin/env python
"""Measure the PifPaf fused-step COLD compile time (VERDICT r2 #5a).

Uses a FRESH compilation-cache directory so the measurement is a true
cold compile (the shared .jax_cache is left untouched), then compiles the
same program again against the warm cache to report the warm-start delta.

    python scripts/measure_pifpaf_compile.py
"""
import json
import os
import sys
import tempfile
import time

import jax

_FRESH = tempfile.mkdtemp(prefix="jax_cold_cache_")
jax.config.update("jax_compilation_cache_dir", _FRESH)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpose_tpu.models.pifpaf import Pifpaf
from hyperpose_tpu.ops.pifpaf_decode import (
    PifPafDecoderConfig, pifpaf_decode_batch,
)

HW = (368, 432)
BATCH = int(os.environ.get("BENCH_BATCH", "8"))


def main():
    model = Pifpaf(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3), jnp.bfloat16),
        train=False,
    )
    cfg = PifPafDecoderConfig()

    @jax.jit
    def fused(v, images_u8):
        x = images_u8.astype(jnp.bfloat16) / 255.0
        out = model.apply(v, x, train=False)
        return pifpaf_decode_batch(out, cfg, 8, HW).scores

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, *HW, 3)), jnp.uint8
    )
    t0 = time.perf_counter()
    jax.block_until_ready(fused(variables, x))
    cold_s = time.perf_counter() - t0

    # Second process-equivalent: clear jit caches, recompile against the
    # now-warm persistent cache.
    fused.clear_cache()
    t0 = time.perf_counter()
    jax.block_until_ready(fused(variables, x))
    warm_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "pifpaf_fused_step_cold_compile",
        "value": round(cold_s, 1), "unit": "seconds",
        "detail": {
            "batch": BATCH, "hw": list(HW),
            "warm_cache_s": round(warm_s, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
