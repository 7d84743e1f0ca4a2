"""Fused TinyVGG serving stem: packed conv1 + bias + relu + 2x2 maxpool in
one VMEM-resident Pallas kernel.

Why: at the throughput batch (128) the flagship's first three ops cost
11.4 ms/step of 72.9 (scripts/profile_flagship.py): conv block_1 is
memory-bound (writes+reads the 20.3 MB/frame full-resolution activation)
and the first maxpool is 3.7 ms of pure HBM traffic. This kernel computes
block_1 + BN + relu + pool1 per image entirely in VMEM: the full-res
activation never exists in HBM — only the pooled (H/2, W/2, 64) output is
written.

Formulation (x-pair packing): the input arrives as bt [B, H, W/2, 128]
where lane block 32*(off+1)+ci holds block_0's 32-channel output at
x = 2q+off for off in {-1, 0, 1, 2} — the x-direction im2col of the pair
grid, emitted DIRECTLY by the packed XLA conv0 (each full-res x-position
is computed into two adjacent pair rows; block_0 is 0.4% of the net's
FLOPs, so the duplication is free and the kernel needs zero in-kernel
data rearrangement — Mosaic rejects lane-offset pad/concat shuffles).
For each output pair q the 3x3 conv over x in {2q-1..2q+2} becomes, per
dy, ONE 128-deep contraction:

    y1p[y, q, 64p+co] = sum_dy bt[y+dy, q, :] @ W1p[dy][:, 64p+co]

i.e. three (rows*W/2, 128) x (128, 128) MXU matmuls per row-strip — full
128-deep contraction, full 128 lanes (2 positions x 64 channels), 1.33x
the raw conv FLOPs (the unavoidable window-overlap redundancy of pair
packing) instead of the 2x a dense packed XLA conv would pay. The 2x2
maxpool collapses in-register: max over the two lane groups, then over
row pairs.

BatchNorm is pre-folded into W1p/b1p (inference only);
models.backbones.remap_vggtiny_to_fused converts any trained/imported
VggTiny checkpoint exactly.

(reference analog: the TensorRT engine's conv+bias+relu+pool tactic fusion,
src/tensorrt.cpp:121-223 — rebuilt here as an explicit TPU kernel.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pick_strip(h: int, max_rows: int = 48) -> int:
    """Largest even divisor of h that is <= max_rows (conv rows per strip)."""
    best = 2
    for d in range(2, max_rows + 1, 2):
        if h % d == 0:
            best = d
    return best


def _conv1_pool_kernel(a_ref, w_ref, b_ref, out_ref, *, strip: int):
    """One image: bt [1, H+2, Q, 128] (y zero-padded x-im2col of block_0's
    packed output) -> out [1, H/2, Q, 64].

    Per strip, the 3 dy taps are fused into ONE K=384 MXU contraction
    (lane-concat of three full-lane dy slices; accumulation happens inside
    the MXU) — three separate K=128 dots + f32 vector adds measured ~8x
    slower (the adds churn a 5 MB accumulator through the VPU per strip)."""
    hp, q = a_ref.shape[1], a_ref.shape[2]
    h = hp - 2
    bias = b_ref[0].astype(jnp.float32)               # (128,)
    w = w_ref[...].reshape(3 * 128, 128)              # dy-major rows
    n_strips = h // strip
    for i in range(n_strips):                          # static unroll
        blk = jnp.concatenate(
            [a_ref[0, i * strip + dy: i * strip + dy + strip]
             for dy in range(3)],
            axis=-1,
        )                                              # (strip, Q, 384)
        acc = lax.dot_general(
            blk.reshape(strip * q, 3 * 128), w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(acc + bias, 0.0).reshape(strip, q, 128)
        y = jnp.maximum(y[:, :, :64], y[:, :, 64:])    # max over x-pair
        y = y.reshape(strip // 2, 2, q, 64)
        y = jnp.max(y, axis=1)                          # max over row pair
        out_ref[0, (i * strip) // 2: (i * strip) // 2 + strip // 2] = (
            y.astype(out_ref.dtype)
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv1_pool(
    btp: jax.Array,    # [B, H, W/2, 128] x-im2col'd packed block_0 output
    w1p: jax.Array,    # [3, 128, 128] dy-major packed folded conv1 weights
    b1p: jax.Array,    # [128] packed folded bias
    interpret: bool = False,
) -> jax.Array:        # [B, H/2, W/2, 64]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, q, c = btp.shape
    assert c == 128 and h % 2 == 0, (h, c)
    strip = _pick_strip(h)
    # The packed conv0 evaluates its off=-1 / off=+2 lane blocks OUTSIDE
    # the image at the q borders (bias+relu leaks through); block_1's SAME
    # padding semantics require zeros there.
    btp = btp.at[:, :, 0, 0:32].set(0.0)
    btp = btp.at[:, :, q - 1, 96:128].set(0.0)
    a_pad = jnp.pad(btp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    kernel = functools.partial(_conv1_pool_kernel, strip=strip)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, q, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h // 2, q, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, q, 64), btp.dtype),
        # Whole-image blocks: in 20.5 MB + out 10.2 MB, double-buffered by
        # the pipeline -> ~61 MB; the default 16 MB scoped-vmem cap is a
        # compiler guard, not the hardware (v5e has 128 MB VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(a_pad, w1p, b1p.reshape(1, 128))
    return out


def fused_conv1_pool_reference(btp, w1p, b1p):
    """Plain-XLA oracle of the kernel semantics (tests)."""
    b, h, q, _ = btp.shape
    btp = btp.at[:, :, 0, 0:32].set(0.0)
    btp = btp.at[:, :, q - 1, 96:128].set(0.0)
    bt = jnp.pad(btp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = sum(
        jnp.einsum("bhqc,cd->bhqd", bt[:, dy: dy + h].astype(jnp.float32),
                   w1p[dy].astype(jnp.float32))
        for dy in range(3)
    )
    y = jnp.maximum(acc + b1p.astype(jnp.float32), 0.0)
    y = jnp.maximum(y[..., :64], y[..., 64:])
    y = y.reshape(b, h // 2, 2, q, 64).max(axis=2)
    return y.astype(btp.dtype)
