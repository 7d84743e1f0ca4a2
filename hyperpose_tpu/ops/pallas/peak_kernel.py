"""Pallas TPU kernel: fused peak-candidate detection.

Fuses the peak-NMS front end of the PAF decoder — separable Gaussian smooth,
3x3 same-max-pool NMS, confidence threshold and integer plateau tie-break —
into ONE VMEM-resident kernel per batch item. The XLA path (ops/paf_decode.
find_peaks) issues these as 4+ HBM-round-trip ops; here each [P, H, W] plane
set is loaded once and every intermediate lives in registers/VMEM.

Semantics note: borders are zero-padded inside the kernel (the XLA path
reflect-pads the smooth), so smoothed values within ksize//2 of the border
differ slightly; peaks there are exceedingly rare and below threshold.

(reference for the op being fused: src/post_process.hpp:56-102 smooth +
same_max_pool_3x3, src/cudnn_kernel_pool.hpp:9-62.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..image import _gaussian_kernel_1d


def _shift2d(x, dy: int, dx: int):
    """Shift a [..., H, W] block by (dy, dx) with zero fill (static shifts)."""
    h, w = x.shape[-2], x.shape[-1]
    pads = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))
    ]
    xp = jnp.pad(x, pads)
    sl = [slice(None)] * (x.ndim - 2) + [
        slice(max(-dy, 0), max(-dy, 0) + h),
        slice(max(-dx, 0), max(-dx, 0) + w),
    ]
    return xp[tuple(sl)]


def _peak_kernel(conf_ref, ranked_ref, smoothed_ref, *, taps, thresh, neg):
    """One batch item: conf [1, P, H, W] block -> ranked + smoothed."""
    x = conf_ref[0]
    p, h, w = x.shape

    # Separable Gaussian smooth as shifted multiply-adds (VPU).
    r = len(taps) // 2
    sm_v = taps[r] * x
    for i in range(1, r + 1):
        sm_v += taps[r - i] * _shift2d(x, i, 0)
        sm_v += taps[r + i] * _shift2d(x, -i, 0)
    sm = taps[r] * sm_v
    for i in range(1, r + 1):
        sm += taps[r - i] * _shift2d(sm_v, 0, i)
        sm += taps[r + i] * _shift2d(sm_v, 0, -i)

    # 3x3 same-max-pool via 8 shifted maxes.
    pooled = sm
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            pooled = jnp.maximum(pooled, _shift2d(sm, dy, dx))
    is_peak = (sm >= pooled) & (sm > thresh)

    # Integer plateau tie-break: keep the max pixel-index candidate per
    # 3x3 window (adjacent survivors are exact ties by construction).
    pix = lax.broadcasted_iota(jnp.int32, (p, h, w), 1) * w + \
        lax.broadcasted_iota(jnp.int32, (p, h, w), 2)
    cand = jnp.where(is_peak, pix, -1)
    pooled_idx = cand
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = _shift2d(cand + 1, dy, dx) - 1  # zero-fill -> -1
            pooled_idx = jnp.maximum(pooled_idx, shifted)
    is_peak = is_peak & (pix == pooled_idx)

    ranked_ref[0] = jnp.where(is_peak, sm, neg)
    smoothed_ref[0] = sm


@functools.partial(
    jax.jit, static_argnames=("ksize", "sigma", "thresh", "neg", "interpret")
)
def fused_peak_candidates(
    conf: jax.Array,  # [B, H, W, P]
    ksize: int = 5,
    sigma: float = 0.75,
    thresh: float = 0.05,
    neg: float = -1e30,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (ranked [B, P, H, W], smoothed [B, P, H, W]): ranked holds the
    smoothed score at surviving peak pixels and `neg` elsewhere — ready for
    a top_k peak selection."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, p = conf.shape
    x = conf.transpose(0, 3, 1, 2)  # [B, P, H, W]
    taps = tuple(float(t) for t in _gaussian_kernel_1d(ksize, sigma))

    kernel = functools.partial(
        _peak_kernel, taps=taps, thresh=thresh, neg=neg
    )
    ranked, smoothed = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, p, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, p, h, w), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return ranked, smoothed
