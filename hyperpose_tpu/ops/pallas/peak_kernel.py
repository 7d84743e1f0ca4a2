"""Pallas TPU kernels: fused peak detection for the PAF decoder.

`fused_peak_topk` fuses the ENTIRE peak front end — separable Gaussian
smooth, 3x3 same-max-pool NMS, confidence threshold, plateau tie-break,
iterative top-K selection, sub-pixel refinement and raw-score gather —
into one VMEM-resident kernel per image. The XLA path (ops/paf_decode.
find_peaks) runs the top-K as 16 argmax/mask rounds that each re-read the
[B, P, H*W] ranked map from HBM (~0.9 ms/batch-128 of pure traffic on
v5e); here the map never leaves VMEM and only the [P, K] results are
written back.

Semantics notes vs the XLA path:
  * borders are zero-padded inside the kernel (the XLA path reflect-pads
    the smooth), so smoothed values within ksize//2 of the border differ
    slightly; peaks there are exceedingly rare and below threshold.
  * value ties resolve to the lowest flat pixel index, identical to the
    XLA path's argmax rounds / lax.top_k stable order.

(reference for the op being fused: src/post_process.hpp:56-102 smooth +
same_max_pool_3x3 + peak selection, src/cudnn_kernel_pool.hpp:9-62.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..image import _gaussian_kernel_1d

_NEG = -1e30


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


def _smooth_nms(x, taps, thresh):
    """Separable Gaussian smooth + 3x3 same-max-pool NMS + plateau
    tie-break on a [P, H, W] block. Returns (smoothed, ranked)."""
    p, h, w = x.shape
    r = len(taps) // 2
    sm_v = taps[r] * x
    for i in range(1, r + 1):
        sm_v += taps[r - i] * _shift2d(x, i, 0)
        sm_v += taps[r + i] * _shift2d(x, -i, 0)
    sm = taps[r] * sm_v
    for i in range(1, r + 1):
        sm += taps[r - i] * _shift2d(sm_v, 0, i)
        sm += taps[r + i] * _shift2d(sm_v, 0, -i)

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
    return sm, jnp.where(is_peak, sm, _NEG), pix


def _peak_topk_kernel(conf_ref, x_ref, y_ref, raw_ref, sval_ref, *,
                      taps, thresh, k):
    """One image: conf [1, P, H, W] -> top-K peaks per part.

    Outputs (each [1, P, 1, K]): sub-pixel x, sub-pixel y, raw score,
    smoothed validity value. Results accumulate into [P, 1, K] buffers via
    broadcasting selects and are stored whole at the end — Mosaic's layout
    inference rejects rank-1 vectors, so no reduction is ever squeezed and
    no per-slot store is issued."""
    x = conf_ref[0]
    p, h, w = x.shape
    sm, cur, pix = _smooth_nms(x, taps, thresh)

    # Axis-neighbor maps for the quadratic sub-pixel fit, computed once.
    sxp = _shift2d(sm, 0, -1)   # value at (y, x+1)
    sxm = _shift2d(sm, 0, 1)
    syp = _shift2d(sm, -1, 0)   # value at (y+1, x)
    sym = _shift2d(sm, 1, 0)

    big = jnp.int32(h * w)
    slot = lax.broadcasted_iota(jnp.int32, (p, 1, k), 2)     # [P,1,K]
    zeros = jnp.zeros((p, 1, k), jnp.float32)
    xbuf, ybuf, rbuf, vbuf = zeros, zeros, zeros, zeros

    # All plane reductions chain two single-axis keepdims reduces: this
    # Mosaic build's layout inference aborts on multi-axis reductions.
    def red2(a, op):
        return op(op(a, axis=2, keepdims=True), axis=1, keepdims=True)

    for kk in range(k):
        pmax = red2(cur, jnp.max)                            # [P,1,1]
        hit = cur == pmax
        tie = red2(jnp.where(hit, pix, big), jnp.min)        # [P,1,1]
        msk = (pix == tie).astype(jnp.float32)               # [P,H,W]

        def msum(a):
            return red2(msk * a, jnp.sum)

        f0, fxp, fxm = msum(sm), msum(sxp), msum(sxm)
        fyp, fym, raw = msum(syp), msum(sym), msum(x)

        def subpix(fp, fm, f0):
            denom = fp - 2.0 * f0 + fm
            off = jnp.where(jnp.abs(denom) > 1e-9,
                            0.5 * (fm - fp) / denom, 0.0)
            return jnp.clip(off, -0.5, 0.5)

        ysf = (tie // w).astype(jnp.float32) + subpix(fyp, fym, f0)
        xsf = (tie % w).astype(jnp.float32) + subpix(fxp, fxm, f0)
        at = slot == kk                                      # [P,1,K]
        xbuf = jnp.where(at, xsf, xbuf)   # [P,1,1] broadcasts over K
        ybuf = jnp.where(at, ysf, ybuf)
        rbuf = jnp.where(at, raw, rbuf)
        vbuf = jnp.where(at, pmax, vbuf)
        cur = jnp.where(msk > 0.0, _NEG, cur)
    x_ref[0] = xbuf
    y_ref[0] = ybuf
    raw_ref[0] = rbuf
    sval_ref[0] = vbuf


@functools.partial(
    jax.jit, static_argnames=("k", "ksize", "sigma", "thresh", "interpret")
)
def fused_peak_topk(
    conf: jax.Array,  # [B, H, W, P]
    k: int = 16,
    ksize: int = 5,
    sigma: float = 0.75,
    thresh: float = 0.05,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (xy [B, P, K, 2] float32 sub-pixel coords,
    raw_score [B, P, K], smoothed_val [B, P, K]); a slot is a real peak iff
    smoothed_val > -1e29 (same sentinel protocol as find_peaks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, p = conf.shape
    x = conf.transpose(0, 3, 1, 2)  # [B, P, H, W]
    taps = tuple(float(t) for t in _gaussian_kernel_1d(ksize, sigma))
    kernel = functools.partial(
        _peak_topk_kernel, taps=taps, thresh=thresh, k=k
    )
    spec = pl.BlockSpec((1, p, 1, k), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((b, p, 1, k), jnp.float32)
    xs, ys, raw, sval = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec, spec, spec),
        out_shape=(shp, shp, shp, shp),
        interpret=interpret,
    )(x)
    xy = jnp.stack([xs[:, :, 0], ys[:, :, 0]], axis=-1)  # [B, P, K, 2]
    return xy, raw[:, :, 0], sval[:, :, 0]


# --- legacy kernel (smooth+NMS only; kept for ablation) ---------------------

def _peak_kernel(conf_ref, ranked_ref, smoothed_ref, *, taps, thresh, neg):
    """One batch item: conf [1, P, H, W] block -> ranked + smoothed."""
    x = conf_ref[0]
    sm, ranked, _ = _smooth_nms(x, taps, thresh)
    ranked_ref[0] = jnp.where(ranked > _NEG * 0.5, sm, neg)
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
    a top_k peak selection. Superseded by fused_peak_topk (which keeps the
    selection in VMEM too); kept for ablation."""
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
