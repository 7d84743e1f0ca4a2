#!/usr/bin/env python
"""Microbench: conv shapes of the TinyVGG flagship vs TPU-friendly padded
variants. Answers (a) whether the 200-channel mid-net convs are lane-pad
bound (200 -> pads to 256 lanes: does an explicit 256-channel conv run
faster in absolute terms?), (b) conv efficiency vs cin/cout, (c) whether
bigger batch helps.

Usage: python scripts/probe_conv_shapes.py
"""
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

STEPS = 30


def bench_conv(b, h, w, cin, cout, note=""):
    k = jnp.asarray(np.random.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    x0 = jnp.asarray(np.random.randn(b, h, w, cin), jnp.bfloat16)

    @jax.jit
    def loop(k, x0):
        def body(_, carry):
            x, acc = carry
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            acc = acc + jnp.sum(y, dtype=jnp.float32)
            # keep the loop live; project y back to cin channels cheaply
            x = x0 + (acc * 1e-30).astype(x0.dtype)
            return x, acc

        return lax.fori_loop(0, STEPS, body, (x0, jnp.float32(0)))[1]

    float(loop(k, x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(k, x0))
        best = min(best, time.perf_counter() - t0)
    t = best / STEPS
    fl = 2 * b * h * w * 9 * cin * cout
    print(f"b{b:<4}{h}x{w:<4} {cin:>4}->{cout:<4} {t*1e3:7.2f} ms "
          f"{fl/t/1e12:6.1f} TF/s  {note}")
    return t


def main():
    print("== mid-net 200-ch convs (92x108) ==")
    t200 = bench_conv(128, 92, 108, 200, 200, "b5/b6 as-is")
    t256 = bench_conv(128, 92, 108, 256, 256, "zero-padded exact variant")
    print(f"   200->200: {t200*1e3:.2f} ms vs padded 256: {t256*1e3:.2f} ms"
          f"  ({'PAD WINS' if t256 < t200 else 'as-is wins'})")
    bench_conv(128, 92, 108, 208, 208, "pad to 208 (sublane only)")

    print("== other flagship shapes ==")
    bench_conv(128, 368, 432, 32, 64, "b1 full-res")
    bench_conv(128, 184, 216, 64, 128, "b2")
    bench_conv(128, 184, 216, 128, 128, "b3")
    bench_conv(128, 92, 108, 128, 200, "b4")
    bench_conv(128, 46, 54, 200, 384, "b7")
    bench_conv(128, 46, 54, 384, 384, "b8")
    bench_conv(128, 46, 54, 384, 512, "b8-pad512")

    print("== batch scaling on b5 shape ==")
    bench_conv(64, 92, 108, 200, 200)
    bench_conv(256, 92, 108, 200, 200)


if __name__ == "__main__":
    main()
