"""Pallas TPU kernel: fused PAF line-integral sample gather.

The PAF decoder samples the part-affinity field at ~K*K*S points per limb
(10 points along the segment between every peak pair; reference:
src/paf.cpp:66-137). TPU has no fast scattered gather, so the XLA path
expresses the lookup as one-hot matmuls — correct, but it materializes a
[L, 2, M, W] intermediate in HBM per image (~21 MB at the default shapes),
which makes this the most bandwidth-expensive stage of the decode
(~6.5 ms/batch-128 measured on v5e).

This kernel performs the same one-hot contraction entirely in VMEM: each
grid cell (batch b, limb l) loads the limb's two field planes (~20 KB),
builds the row one-hot on the fly with iota compares, runs ONE MXU dot
[H, 2W] x [H, M] -> [2W, M], and reduces the column selection on the VPU.
Nothing but the inputs (planes + indices) and the [2, M] result touches
HBM. Everything stays lane-major over M — no in-kernel transposes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _line_gather_kernel(paf_ref, ly_ref, lx_ref, out_ref, *, h, w, m, l, gdt):
    """One image per grid cell: planes [1,L,2,H,W] + indices [1,L,M] ->
    gathered values [1,L,2,M]. The limb loop is unrolled inside the cell —
    one cell per (image, limb) measured 2.1 ms/batch-128 in per-cell
    overheads (DMA issue + grid step) against ~50 us of real MXU work;
    amortizing 19 limbs per cell removes most of it."""
    for j in range(l):
        pafc = paf_ref[0, j]                   # [2, H, W]
        ly = ly_ref[0, j]                      # [M] int32, lane-major
        lx = lx_ref[0, j]
        # Pack the two field channels along the lane axis: [H, 2W].
        packed = jnp.concatenate([pafc[0], pafc[1]], axis=1).astype(gdt)
        # Transposed row one-hot [H, M]: keeps M in lanes end-to-end.
        row_ohT = (
            lax.broadcasted_iota(jnp.int32, (h, m), 0) == ly[None, :]
        ).astype(gdt)
        rowsT = lax.dot_general(
            packed, row_ohT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [2W, M]
        # One [W, M] column mask shared by both channels (packed halves).
        col_mask = jnp.where(
            lax.broadcasted_iota(jnp.int32, (w, m), 0) == lx[None, :],
            1.0, 0.0,
        )
        out_ref[0, j, 0] = jnp.sum(rowsT[:w] * col_mask, axis=0)
        out_ref[0, j, 1] = jnp.sum(rowsT[w:] * col_mask, axis=0)


@functools.partial(jax.jit, static_argnames=("bf16", "interpret"))
def fused_line_gather(
    paf_planes: jax.Array,   # [B, L, 2, H, W] float
    ly: jax.Array,           # [B, L, M] int32, in [0, H)
    lx: jax.Array,           # [B, L, M] int32, in [0, W)
    bf16: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Returns vals [B, L, 2, M] float32: vals[b,l,c,m] =
    paf_planes[b,l,c,ly[b,l,m],lx[b,l,m]].

    bf16=True rounds the field values to bfloat16 before the selection
    (the selection itself is exact); matches PafDecoderConfig.gather_bf16.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, _, h, w = paf_planes.shape
    m = ly.shape[-1]
    gdt = jnp.bfloat16 if bf16 else jnp.float32
    kernel = functools.partial(
        _line_gather_kernel, h=h, w=w, m=m, l=l, gdt=gdt
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, 2, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, 2, m), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, 2, m), jnp.float32),
        interpret=interpret,
    )(paf_planes.astype(jnp.float32), ly, lx)
