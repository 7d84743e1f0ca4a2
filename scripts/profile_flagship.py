#!/usr/bin/env python
"""Per-segment on-chip profile of the flagship LW-OpenPose(TinyVGG) step.

The remote-TPU tunnel does not expose jax.profiler traces, so this measures
the honest way the bench does: chained fori_loop over truncated prefixes of
the model, so segment time = prefix[k] - prefix[k-1]. Every number is
ms/step at the given batch.

Usage: python scripts/profile_flagship.py [batch] [steps]
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
from flax import linen as nn
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpose_tpu.models.backbones import ConvBN, VggTiny
from hyperpose_tpu.models.openpose import LightWeightOpenPose
from hyperpose_tpu.ops.paf_decode import PafDecoderConfig, paf_decode_batch

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
HW = (368, 432)
FEAT = (HW[0] // 8, HW[1] // 8)


class VggTinyPrefix(nn.Module):
    """First `n_items` items of VggTiny's cfg (convs + pools)."""

    n_items: int
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = [(32, 1), (64, 1), "pool", (128, 1), (128, 1), "pool",
               (200, 1), (200, 1), (200, 1), "pool", (384, 1), (384, 1)]
        i = 0
        for item in cfg[: self.n_items]:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, s = item
                x = ConvBN(f, strides=(s, s), dtype=jnp.bfloat16,
                           name=f"block_{i}")(x, False)
                i += 1
        return x


def timeit(fn, *args):
    """Chained-loop best-of-3 wall time for one jitted callable -> seconds."""
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def chained(step_fn):
    @jax.jit
    def run(v, x0):
        def body(_, carry):
            x, acc = carry
            out = step_fn(v, x)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            x = x + (acc * 1e-24).astype(x.dtype)
            return x, acc

        _, acc = lax.fori_loop(0, STEPS, body, (x0, jnp.float32(0.0)))
        return acc

    return run


def main():
    rng = jax.random.PRNGKey(0)
    x0 = jnp.asarray(np.random.rand(BATCH, *HW, 3), jnp.bfloat16)
    rows = []

    # RPC floor: a trivial chained loop measures tunnel overhead.
    @jax.jit
    def nop(v, x0):
        def body(_, c):
            return c * jnp.float32(1.0000001)
        return lax.fori_loop(0, STEPS, body, jnp.float32(1.0))
    t0 = time.perf_counter()
    float(nop(None, None))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(nop(None, None))
        best = min(best, time.perf_counter() - t0)
    rpc_s = best
    print(f"rpc_floor_total_s {rpc_s*1000:8.1f} ms  (whole call)")

    # Backbone prefixes.
    cfg_names = ["b0_32", "b1_64", "pool1", "b2_128", "b3_128", "pool2",
                 "b4_200", "b5_200", "b6_200", "pool3", "b7_384", "b8_384"]
    prev = rpc_s
    for n in range(1, 13):
        model = VggTinyPrefix(n_items=n)
        v = model.init(rng, x0[:1])
        fn = chained(lambda vv, xx, m=model: m.apply(vv, xx))
        best, comp = timeit(fn, v, x0)
        seg_ms = (best - prev) / STEPS * 1000
        tot_ms = (best - rpc_s) / STEPS * 1000
        rows.append((cfg_names[n - 1], seg_ms, tot_ms))
        print(f"{cfg_names[n-1]:>8}  seg {seg_ms:7.2f} ms  cum {tot_ms:7.2f} ms"
              f"  (compile {comp:.0f}s)")
        prev = best

    backbone_s = prev

    # Full model forward (backbone + heads).
    model = LightWeightOpenPose(backbone=VggTiny, dtype=jnp.bfloat16)
    v = model.init(rng, x0[:1], train=False)

    fn = chained(lambda vv, xx: model.apply(vv, xx, train=False)["conf_map"])
    best_fwd, comp = timeit(fn, v, x0)
    print(f"{'heads':>8}  seg {(best_fwd-backbone_s)/STEPS*1000:7.2f} ms  "
          f"cum {(best_fwd-rpc_s)/STEPS*1000:7.2f} ms  (compile {comp:.0f}s)")

    # Forward + decode (the bench's fused step).
    cfg = PafDecoderConfig()

    def fused(vv, xx):
        out = model.apply(vv, xx, train=False)
        d = paf_decode_batch(out["conf_map"].astype(jnp.float32),
                             out["paf_map"].astype(jnp.float32), cfg, FEAT)
        return d.scores

    fn = chained(fused)
    best_full, comp = timeit(fn, v, x0)
    print(f"{'decode':>8}  seg {(best_full-best_fwd)/STEPS*1000:7.2f} ms  "
          f"cum {(best_full-rpc_s)/STEPS*1000:7.2f} ms  (compile {comp:.0f}s)")

    step_ms = (best_full - rpc_s) / STEPS * 1000
    print(f"\nTOTAL {step_ms:.2f} ms/step  -> {BATCH / step_ms * 1000:.0f} fps"
          f"  (batch {BATCH}, steps {STEPS})")


if __name__ == "__main__":
    main()
