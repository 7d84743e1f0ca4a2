#!/usr/bin/env python
"""Isolate the fused-stem pieces on chip: packed conv0 vs Pallas kernel."""
import os
import sys
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpose_tpu.ops.pallas.stem_kernel import fused_conv1_pool

B = int(os.environ.get("B", "128"))
STEPS = 30


def timeit(fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, carry):
            x, acc = carry
            out = fn(*([x] + list(a[1:])))
            acc = acc + jnp.sum(out, dtype=jnp.float32)
            x = a[0] + (acc * 1e-30).astype(a[0].dtype)
            return x, acc
        return lax.fori_loop(0, STEPS, body, (a[0], jnp.float32(0)))[1]

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    rng = np.random.default_rng(0)
    # packed conv0: (B,368,216,6) -> (B,368,216,128)
    xp = jnp.asarray(rng.random((B, 368, 216, 6)), jnp.bfloat16)
    k0 = jnp.asarray(rng.standard_normal((3, 3, 6, 128)) * 0.1, jnp.bfloat16)

    def conv0(x, k):
        return jnp.maximum(lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)

    t = timeit(conv0, xp, k0)
    print(f"conv0p XLA:        {t*1e3:7.2f} ms/step")

    bt = jnp.asarray(rng.random((B, 368, 216, 128)), jnp.bfloat16)
    w1p = jnp.asarray(rng.standard_normal((3, 128, 128)) * 0.05, jnp.bfloat16)
    b1p = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    t = timeit(lambda x, w, b: fused_conv1_pool(x, w, b), bt, w1p, b1p)
    fl = 2 * B * 368 * 216 * 3 * 128 * 128
    print(f"pallas conv1+pool: {t*1e3:7.2f} ms/step  {fl/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
