#!/usr/bin/env python
"""Probe: does s8 x s8 -> s32 dot_general hit the MXU int8 fast path?

v5e datasheet: 394 int8 TOPS vs 197 bf16 TFLOPS (2x). If XLA lowers an
int8 dot_general onto that path, a large square matmul should run ~2x the
bf16 rate; if it instead upcasts to f32/bf16 (what we observed for s8
convs, docs/performance.md "int8 quantized serving"), it will be <=1x.

Evidence feeding VERDICT round-1 item #9: attempt the dot_general
reformulation before declaring int8 a size-only feature.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(fn, *args, steps=30):
    @jax.jit
    def loop(a, b):
        def body(_, carry):
            acc, a = carry
            o = fn(a, b)
            # Consume the FULL output (a single-element read would let XLA
            # slice into the dot / hoist it as loop-invariant) and feed a
            # value-dependent perturbation back into the carry so every
            # iteration's dot is live. (acc * 1e-30) is 0 at runtime for
            # int8 and ~0 for bf16, but the compiler cannot fold it.
            acc = acc + jnp.sum(o, dtype=jnp.float32)
            a = a + (acc * 1e-30).astype(a.dtype)
            return acc, a

        return lax.fori_loop(0, steps, body, (jnp.float32(0), a))[0]

    float(loop(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    n = 4096
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n), dtype=np.int8))
    abf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    flops = 2 * n ** 3

    def dot_i8(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def dot_bf(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    t_bf = bench(dot_bf, abf, bbf)
    t_i8 = bench(dot_i8, a8, b8)
    print(f"bf16 {n}x{n}x{n}: {t_bf*1e3:.3f} ms  "
          f"{flops/t_bf/1e12:.1f} TFLOP/s")
    print(f"int8 {n}x{n}x{n}: {t_i8*1e3:.3f} ms  "
          f"{flops/t_i8/1e12:.1f} TOP/s")
    print(f"int8 speedup vs bf16: {t_bf/t_i8:.2f}x")

    # HLO evidence: what does the int8 dot lower to?
    lowered = jax.jit(dot_i8).lower(a8, b8)
    hlo = lowered.compile().as_text()
    conv_lines = [l.strip() for l in hlo.splitlines()
                  if ("dot" in l or "convert" in l) and "%" in l]
    print("--- compiled HLO (dot/convert lines) ---")
    for l in conv_lines[:12]:
        print(l[:160])


if __name__ == "__main__":
    main()
