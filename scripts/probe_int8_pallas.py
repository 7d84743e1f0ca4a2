#!/usr/bin/env python
"""Pallas s8 x s8 -> s32 matmul micro-kernel vs the same kernel in bf16.

Closes the round-4 int8 question (VERDICT item 9): XLA-level measurement
already showed s8 dot_general runs 1.29x bf16 (not the datasheet 2x) and
s8 convs run 0.75x (docs/performance.md "int8 quantized serving"). This
probe asks whether a HAND-WRITTEN Pallas kernel can do better than XLA's
lowering on a flagship-like contraction: tiled matmul over an
im2col-shaped problem (M=4096 positions, K=1792 taps, N=256 channels),
identical kernel structure for both dtypes, accumulating in s32/f32.

If pallas-int8 <= pallas-bf16, the conclusion "int8 is a deployment-size
feature on v5e, not a speed feature" is closed at the kernel level too.

Run on the TPU:  python scripts/probe_int8_pallas.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

M, K, N = 4096, 1792, 256
BM, BN = 512, 256


def matmul_kernel(a_ref, b_ref, o_ref, acc_dtype):
    o_ref[:] = jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=acc_dtype
    )


def make_matmul(in_dtype, acc_dtype):
    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            functools.partial(matmul_kernel, acc_dtype=acc_dtype),
            grid=(M // BM, N // BN),
            in_specs=[
                pl.BlockSpec((BM, K), lambda i, j: (i, 0)),
                pl.BlockSpec((K, BN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        )(a, b)

    return mm


def bench(mm, a, b, in_dtype, steps=30):
    """Honest chained loop: full output consumed, value-dependent carry
    perturbation so no iteration can be folded (the axon tunnel caches
    identical executions; see docs/performance.md methodology)."""

    @jax.jit
    def loop(a, b):
        def body(_, carry):
            acc, a = carry
            o = mm(a, b)
            acc = acc + jnp.sum(o, dtype=jnp.float32)
            a = a + (acc * 1e-30).astype(a.dtype)
            return acc, a

        return lax.fori_loop(0, steps, body, (jnp.float32(0), a))[0]

    float(loop(a, b))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(a, b))
        best = min(best, time.perf_counter() - t0)
    ops = 2 * M * K * N * steps
    return ops / best / 1e12


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(0, 1, (K, N)), jnp.bfloat16)

    mm8 = make_matmul(jnp.int8, jnp.int32)
    want = jnp.dot(a8.astype(jnp.int32), b8.astype(jnp.int32))
    got = mm8(a8, b8)
    assert np.array_equal(np.asarray(got), np.asarray(want)), \
        "pallas int8 matmul wrong"

    t_bf = bench(make_matmul(jnp.bfloat16, jnp.float32), abf, bbf, jnp.bfloat16)
    t_s8 = bench(mm8, a8, b8, jnp.int8)
    print(f"pallas bf16->f32: {t_bf:.1f} TFLOP/s")
    print(f"pallas  s8 ->s32: {t_s8:.1f} TOP/s")
    print(f"ratio s8/bf16: {t_s8 / t_bf:.2f}x "
          f"(datasheet fast path would be ~2x)")


if __name__ == "__main__":
    main()
