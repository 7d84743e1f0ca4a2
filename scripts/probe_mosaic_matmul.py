#!/usr/bin/env python
"""Isolate the Mosaic matmul throughput gap seen in the fused-stem kernel
(docs/performance.md "Fused-stem ablation": ~27 TF/s on (9936,384)x(384,128)
strip contractions vs XLA's 122 TF/s on the equivalent conv).

Measures bare pallas_call matmuls at the stem kernel's shapes and at
square control shapes, against jnp.dot on the same operands.
"""
import functools
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


def pallas_batch_matmul(a, w):
    """a [G, M, K] @ w [K, N] -> [G, M, N], one grid step per G slice —
    the fused-stem kernel's access pattern."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, m, k = a.shape
    n = w.shape[1]

    def kernel(a_ref, w_ref, o_ref):
        o_ref[0] = lax.dot_general(
            a_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, m, n), a.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a, w)


def timeit(fn, *args):
    @jax.jit
    def loop(a, *rest):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *rest)
            acc = acc + jnp.sum(out, dtype=jnp.float32)
            x = a + (acc * 1e-30).astype(a.dtype)
            return x, acc

        return lax.fori_loop(0, STEPS, body, (a, jnp.float32(0)))[1]

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def row(name, g, m, k, n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((g, m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
    fl = 2 * g * m * k * n

    t_p = timeit(pallas_batch_matmul, a, w)
    t_x = timeit(
        lambda aa, ww: jnp.einsum(
            "gmk,kn->gmn", aa, ww,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        a, w,
    )
    print(f"{name:>28}  pallas {t_p*1e3:7.2f} ms {fl/t_p/1e12:6.1f} TF/s"
          f"   xla {t_x*1e3:7.2f} ms {fl/t_x/1e12:6.1f} TF/s")


def main():
    # the stem kernel's strip shape: 128 images x 8 strips
    row("stem strips (9936,384,128)", 256, 9936, 384, 128)
    # same math, 4 strips per grid step (bigger M amortization)
    row("big-M (39744,384,128)", 64, 39744, 384, 128)
    # square control
    row("square (2048,2048,2048)", 8, 2048, 2048, 2048)
    # wide-N control
    row("wide-N (9936,384,512)", 32, 9936, 384, 512)


if __name__ == "__main__":
    main()
