"""Pallas TPU kernel: fused PifPaf skeleton growth.

The growth phase dominates PifPaf decode latency: 8 Jacobi rounds, each a
chain of ~60 small VPU ops (two find_connection evaluations over every
directed edge, per-part segment max, commit) on tiny [MH, E, K] tensors.
Under XLA each round costs ~1 ms in kernel launch + latency; fused here the
whole growth — all humans, all rounds — is ONE kernel invocation per block
of images with every intermediate VMEM-resident. Processing several images
per grid step (rank-4 [IB, MH, E, K] math) amortizes Mosaic's per-op
overhead, which dominates at these tiny shapes.

Semantics are identical to the XLA fallback `grow` in ops/pifpaf_decode.py
(same 2-best blending, reverse-match check and first-index tie-breaks;
reference: hyperpose/Model/pifpaf/processor.py:262-393 find_connection/grow,
src/pifpaf_decoder/openpifpaf_postprocessor.cpp:382-572).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fc_batch(mx, my, ms, ox, oy, os_, qx, qy, qs):
    """Vectorized find_connection with 2-best blending.

    mx/my/ms (match side) and ox/oy/os_ (output side): [IB, E, K] candidate
    tables; qx/qy/qs: [IB, MH, E] query points. Returns fc/fx/fy/fs
    [IB, MH, E]. Mirrors _find_connection (ops/pifpaf_decode.py)
    element-for-element.
    """
    k = mx.shape[-1]
    sf = 2.0 * qs
    sg = jnp.maximum(0.25 * qs * qs, 1e-6)
    dx = mx[:, None] - qx[..., None]                   # [IB, MH, E, K]
    dy = my[:, None] - qy[..., None]
    near = (jnp.abs(dx) <= sf[..., None]) & (jnp.abs(dy) <= sf[..., None])
    d2 = dx * dx + dy * dy
    w = jnp.where(near, jnp.exp(-0.5 * d2 / sg[..., None]) * ms[:, None], 0.0)

    kiota = lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    s1 = jnp.max(w, axis=-1)
    i1 = jnp.min(jnp.where(w >= s1[..., None], kiota, k), axis=-1)
    oh1 = kiota == i1[..., None]

    def gather1(t):
        return jnp.sum(jnp.where(oh1, t[:, None], 0.0), axis=-1)

    o1x, o1y, o1s = gather1(ox), gather1(oy), gather1(os_)

    w2 = jnp.where(oh1, 0.0, w)
    s2 = jnp.max(w2, axis=-1)
    i2 = jnp.min(jnp.where(w2 >= s2[..., None], kiota, k), axis=-1)
    oh2 = kiota == i2[..., None]

    def gather2(t):
        return jnp.sum(jnp.where(oh2, t[:, None], 0.0), axis=-1)

    o2x, o2y, o2s = gather2(ox), gather2(oy), gather2(os_)

    no_match = s1 <= 0.0
    second_bad = (s2 < 0.01) | (s2 < 0.5 * s1)
    d12 = (o1x - o2x) ** 2 + (o1y - o2y) ** 2
    too_far = d12 > (o1s * o1s / 4.0)
    use_single = second_bad | too_far

    denom = jnp.maximum(s1 + s2, 1e-12)
    fc = jnp.where(use_single, 0.5 * s1, 0.5 * (s1 + s2))
    fx = jnp.where(use_single, o1x, (o1x * s1 + o2x * s2) / denom)
    fy = jnp.where(use_single, o1y, (o1y * s1 + o2y * s2) / denom)
    fs = jnp.where(use_single, o1s, (o1s * s1 + o2s * s2) / denom)
    zero = jnp.zeros_like(fc)
    return (
        jnp.where(no_match, zero, fc), jnp.where(no_match, zero, fx),
        jnp.where(no_match, zero, fy), jnp.where(no_match, zero, fs),
    )


def _grow_kernel(
    seed_part_ref, seed_vals_ref,
    em_x_ref, em_y_ref, em_s_ref, eo_x_ref, eo_y_ref, eo_s_ref,
    rm_x_ref, rm_y_ref, rm_s_ref, ro_x_ref, ro_y_ref, ro_s_ref,
    src_oh_ref, dst_oh_ref,
    score_out, x_out, y_out, sc_out,
    *, n_parts, growth_steps, reverse_match,
):
    """One block of IB images: grow every seed's skeleton for
    `growth_steps` rounds."""
    seed_part = seed_part_ref[:, 0]                    # [IB, MH] int32
    sv = seed_vals_ref[...]                            # [IB, MH, 4]
    ib, mh = seed_part.shape

    em_x, em_y, em_s = em_x_ref[...], em_y_ref[...], em_s_ref[...]
    eo_x, eo_y, eo_s = eo_x_ref[...], eo_y_ref[...], eo_s_ref[...]
    rm_x, rm_y, rm_s = rm_x_ref[...], rm_y_ref[...], rm_s_ref[...]
    ro_x, ro_y, ro_s = ro_x_ref[...], ro_y_ref[...], ro_s_ref[...]

    src_oh_c = src_oh_ref[...]                         # [P, E]
    dst_oh_c = dst_oh_ref[...]                         # [P, E]
    e = src_oh_c.shape[1]

    # Seed one-hot init: ann_* [IB, MH, P].
    piota = lax.broadcasted_iota(jnp.int32, (ib, mh, n_parts), 2)
    seed_oh = (piota == seed_part[..., None]).astype(jnp.float32)
    ann_x = seed_oh * sv[..., 0:1]
    ann_y = seed_oh * sv[..., 1:2]
    ann_sc = seed_oh * sv[..., 2:3]
    ann_score = seed_oh * sv[..., 3:4]

    eiota = lax.broadcasted_iota(jnp.int32, (ib, mh, e, n_parts), 2)

    def edge_gather(ann, oh):
        # [IB, MH, P] x [P, E] -> [IB, MH, E]; 2-D dot keeps Mosaic happy.
        return jnp.dot(ann.reshape(ib * mh, n_parts), oh).reshape(ib, mh, e)

    def round_step(_, ann):
        # fori_loop, not unrolled: unrolling the 8 rounds made the Mosaic
        # program ~8x larger and cold compile ~113 s (round-4 measurement);
        # the loop-carried version compiles in seconds at identical
        # steady-state cost.
        ann_score, ann_x, ann_y, ann_sc = ann
        # Per-edge source/destination state via one-hot contractions (MXU).
        src_score = edge_gather(ann_score, src_oh_c)   # [IB, MH, E]
        dst_score = edge_gather(ann_score, dst_oh_c)
        qx = edge_gather(ann_x, src_oh_c)
        qy = edge_gather(ann_y, src_oh_c)
        qs = edge_gather(ann_sc, src_oh_c)

        fc, fx, fy, fs = _fc_batch(
            em_x, em_y, em_s, eo_x, eo_y, eo_s, qx, qy, qs
        )
        merge = jnp.sqrt(jnp.maximum(fc * src_score, 0.0))
        if reverse_match:
            rc, rx, ry, _ = _fc_batch(
                rm_x, rm_y, rm_s, ro_x, ro_y, ro_s, fx, fy, fs
            )
            rev_ok = (rc > 0.0) & (
                jnp.abs(qx - rx) + jnp.abs(qy - ry) <= qs
            )
            merge = jnp.where(rev_ok, merge, 0.0)
        ok = (src_score > 0.0) & (dst_score <= 0.0) & (fc > 0.0)
        merge = jnp.where(ok, merge, 0.0)

        # Per-part best incoming edge (segment max + first-index tie-break).
        contrib = jnp.where(
            dst_oh_c.T[None, None] > 0.0, merge[..., None], 0.0
        )                                              # [IB, MH, E, P]
        best = jnp.max(contrib, axis=2)                # [IB, MH, P]
        ibest = jnp.min(
            jnp.where(contrib >= best[:, :, None, :], eiota, e), axis=2
        )
        ohe = eiota == ibest[:, :, None, :]            # [IB, MH, E, P]

        def commit(vals):
            return jnp.sum(jnp.where(ohe, vals[..., None], 0.0), axis=2)

        do = best > 0.0
        return (
            jnp.where(do, best, ann_score),
            jnp.where(do, commit(fx), ann_x),
            jnp.where(do, commit(fy), ann_y),
            jnp.where(do, commit(fs), ann_sc),
        )

    ann_score, ann_x, ann_y, ann_sc = lax.fori_loop(
        0, growth_steps, round_step,
        (ann_score, ann_x, ann_y, ann_sc),
    )

    score_out[...] = ann_score
    x_out[...] = ann_x
    y_out[...] = ann_y
    sc_out[...] = ann_sc


def _images_per_block(b: int, e: int, k: int, mh: int) -> int:
    """Largest divisor of b whose [IB, MH, E, K] working set keeps the
    kernel comfortably inside ~16 MB VMEM (~15 live rank-4 temporaries)."""
    budget = 6 * 1024 * 1024  # bytes for the rank-4 temporaries
    per_image = mh * e * k * 4 * 15
    cap = max(1, budget // max(per_image, 1))
    ib = 1
    for d in range(1, b + 1):
        if b % d == 0 and d <= cap:
            ib = d
    return ib


@functools.partial(
    jax.jit,
    static_argnames=(
        "e_src", "e_dst", "n_parts", "growth_steps", "reverse_match",
        "interpret",
    ),
)
def fused_grow(
    seed_part: jax.Array,     # [B, MH] int32
    seed_vals: jax.Array,     # [B, MH, 4] f32 (x, y, scale, score)
    tables: tuple[jax.Array, ...],      # 6 x [B, E, K] forward tables
    rev_tables: tuple[jax.Array, ...],  # 6 x [B, E, K] reverse tables
    e_src: tuple[int, ...],
    e_dst: tuple[int, ...],
    n_parts: int,
    growth_steps: int = 8,
    reverse_match: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (ann_score, ann_x, ann_y, ann_sc), each [B, MH, P]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, mh = seed_part.shape
    e, k = tables[0].shape[1], tables[0].shape[2]
    n_e = len(e_src)
    src_oh = np.zeros((n_parts, n_e), np.float32)
    src_oh[np.asarray(e_src), np.arange(n_e)] = 1.0
    dst_oh = np.zeros((n_parts, n_e), np.float32)
    dst_oh[np.asarray(e_dst), np.arange(n_e)] = 1.0

    ib = _images_per_block(b, e, k, mh)
    kernel = functools.partial(
        _grow_kernel, n_parts=n_parts,
        growth_steps=growth_steps, reverse_match=reverse_match,
    )
    table_spec = pl.BlockSpec(
        (ib, e, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    oh_spec = pl.BlockSpec(
        (n_parts, n_e), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    ann_spec = pl.BlockSpec(
        (ib, mh, n_parts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    ann_shape = jax.ShapeDtypeStruct((b, mh, n_parts), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b // ib,),
        in_specs=[
            # [B, 1, MH]: the seed-part ints ride a rank-3 layout so the
            # grid-blocked dim stays out of the (8, 128)-tiled trailing pair
            # (mosaic block-shape rule).
            pl.BlockSpec((ib, 1, mh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib, mh, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [table_spec] * 12 + [oh_spec, oh_spec],
        out_specs=(ann_spec,) * 4,
        out_shape=(ann_shape,) * 4,
        interpret=interpret,
    )(seed_part[:, None], seed_vals, *tables, *rev_tables,
      jnp.asarray(src_oh), jnp.asarray(dst_oh))
