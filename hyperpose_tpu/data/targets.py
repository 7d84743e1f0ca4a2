"""On-device training-target generation for all model families.

The reference generates target maps on the host inside tf.py_function workers
(reference: hyperpose/Model/openpose/utils.py:55-216 put_heatmap /
cal_vectormap_fast, pose_proposal/utils.py:17-69 get_pose_proposals,
pifpaf/utils.py:117-240 put_pifmap / put_pafmap). Here every generator is a
pure, fixed-shape jax function so it fuses into the jitted train step: the
host ships only uint8 images + keypoint arrays and the TPU builds the dense
maps itself (vectorized over batch, people and parts — no Python loops over
annotations).

Conventions shared by all generators:
  kpts  [B, M, P, 2] float32 — (x, y) in input-image pixels; missing
        keypoints hold a large negative sentinel (augment.MISSING).
  valid [B, M, P] bool — per-keypoint visibility.
  limbs [L, 2] int32 — part-index pairs in channel order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Threshold on the Gaussian exponent; exp(-4.6052) ~ 0.01
# (reference: openpose/utils.py:75 `arg > 4.6052` cutoff).
_CONF_ARG_CUTOFF = 4.6052


# ---------------------------------------------------------------------------
# OpenPose family: part-confidence + part-affinity-field maps
# ---------------------------------------------------------------------------

def openpose_conf_map(
    kpts: jnp.ndarray, valid: jnp.ndarray,
    in_hw: tuple[int, int], out_hw: tuple[int, int], sigma: float = 7.0,
) -> jnp.ndarray:
    """Gaussian part-confidence maps + background channel.

    Returns [B, hout, wout, P+1]; channel P is the background
    `clip(1 - max_parts, 0, 1)` (reference: openpose/utils.py:48,55-86:
    per-person max-combined Gaussians with the 4.6052 exponent cutoff, grid
    sample points at stride*i + stride/2 - 0.5).
    """
    hin, win = in_hw
    hout, wout = out_hw
    sy = hin / hout
    sx = win / wout
    gy = jnp.arange(hout, dtype=jnp.float32) * sy + sy / 2.0 - 0.5
    gx = jnp.arange(wout, dtype=jnp.float32) * sx + sx / 2.0 - 0.5

    cx = kpts[..., 0]  # [B, M, P]
    cy = kpts[..., 1]
    ok = valid & (cx >= 0) & (cy >= 0)

    dy2 = (gy[None, None, None, :] - cy[..., None]) ** 2  # [B, M, P, hout]
    dx2 = (gx[None, None, None, :] - cx[..., None]) ** 2  # [B, M, P, wout]
    arg = (dy2[..., :, None] + dx2[..., None, :]) / (2.0 * sigma * sigma)
    g = jnp.where(
        (arg <= _CONF_ARG_CUTOFF) & ok[..., None, None], jnp.exp(-arg), 0.0
    )
    heat = jnp.max(g, axis=1)  # [B, P, hout, wout] — max over people
    bg = jnp.clip(1.0 - jnp.max(heat, axis=1), 0.0, 1.0)
    full = jnp.concatenate([heat, bg[:, None]], axis=1)
    return full.transpose(0, 2, 3, 1)


def openpose_paf_map(
    kpts: jnp.ndarray, valid: jnp.ndarray, limbs: np.ndarray,
    in_hw: tuple[int, int], out_hw: tuple[int, int], width: float = 1.0,
) -> jnp.ndarray:
    """Count-normalized part-affinity vector fields.

    Returns [B, hout, wout, 2L] with limb l writing channels (2l, 2l+1) =
    (vx, vy). A grid cell inside a limb's band (|perpendicular| <= width grid
    cells, 0 <= projection <= limb length) accumulates the limb's unit
    vector; overlapping people average by contribution count
    (reference: openpose/utils.py:89-216 get_paf_map / cal_vectormap_fast).
    """
    limbs = jnp.asarray(limbs, jnp.int32)
    hin, win = in_hw
    hout, wout = out_hw
    sy = hin / hout
    sx = win / wout
    scale = jnp.array([sx, sy], jnp.float32)

    src = kpts[:, :, limbs[:, 0]] / scale  # [B, M, L, 2] grid coords
    dst = kpts[:, :, limbs[:, 1]] / scale
    ok = valid[:, :, limbs[:, 0]] & valid[:, :, limbs[:, 1]]  # [B, M, L]

    vec = dst - src
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1))  # [B, M, L]
    unit = vec / jnp.maximum(norm, 1e-8)[..., None]

    gy = jnp.arange(hout, dtype=jnp.float32)
    gx = jnp.arange(wout, dtype=jnp.float32)
    # rel = cell - src, per grid cell: [B, M, L, hout, wout]
    rel_x = gx[None, None, None, None, :] - src[..., 0][..., None, None]
    rel_y = gy[None, None, None, :, None] - src[..., 1][..., None, None]
    ux = unit[..., 0][..., None, None]
    uy = unit[..., 1][..., None, None]
    along = rel_x * ux + rel_y * uy
    perp = jnp.abs(rel_x * uy - rel_y * ux)
    band = (
        (along >= 0.0)
        & (along <= norm[..., None, None])
        & (perp <= width)
        & ok[..., None, None]
    )
    bandf = band.astype(jnp.float32)
    # Sum unit vectors over people, normalize by contributor count
    # (reference: utils.py:169-216 vectormap accumulated then /= count).
    sum_x = jnp.sum(bandf * ux, axis=1)  # [B, L, hout, wout]
    sum_y = jnp.sum(bandf * uy, axis=1)
    count = jnp.maximum(jnp.sum(bandf, axis=1), 1.0)
    paf = jnp.stack([sum_x / count, sum_y / count], axis=2)  # [B, L, 2, h, w]
    b, n_limbs = paf.shape[0], paf.shape[1]
    return paf.reshape(b, 2 * n_limbs, hout, wout).transpose(0, 2, 3, 1)


def openpose_targets(
    kpts: jnp.ndarray, valid: jnp.ndarray, limbs: np.ndarray,
    in_hw: tuple[int, int], out_hw: tuple[int, int],
    mask: jnp.ndarray | None = None, sigma: float = 7.0,
) -> dict[str, jnp.ndarray]:
    """Bundle conf + paf maps. `mask` is accepted for signature parity; the
    OpenPose loss applies the don't-care mask itself (models/openpose.py)."""
    del mask
    return {
        "conf_map": openpose_conf_map(kpts, valid, in_hw, out_hw, sigma),
        "paf_map": openpose_paf_map(kpts, valid, limbs, in_hw, out_hw),
    }


# ---------------------------------------------------------------------------
# PoseProposal: grid-cell detection + limb edge tensor
# ---------------------------------------------------------------------------

def ppn_targets(
    kpts: jnp.ndarray, valid: jnp.ndarray, bbxs: jnp.ndarray,
    limbs: np.ndarray, in_hw: tuple[int, int], out_hw: tuple[int, int],
    nei: tuple[int, int] = (9, 9), instance_idx: int = 1,
) -> dict[str, jnp.ndarray]:
    """PoseProposal grid targets.

    Returns dict of
      c/x/y/w/h [B, hout, wout, K]  — cell one-hot confidence, fractional
        cell offsets, and box sizes normalized by (win, hin); part boxes are
        max(bbox_w, bbox_h)/8 px, the Instance anchor /4
        (reference: pose_proposal/utils.py:17-69 get_pose_proposals).
      e      [B, L, hnei, wnei, hout, wout] — 1 where limb l connects the
        source cell to the (di, dj) neighborhood offset of its target cell.
      e_mask [B, L, hnei, wnei, hout, wout] — supervision window: the full
        neighborhood of every cell holding a valid source part of limb l.
    """
    limbs = jnp.asarray(limbs, jnp.int32)
    hin, win = in_hw
    hout, wout = out_hw
    hnei, wnei = nei
    sy = hin / hout
    sx = win / wout
    b, m, p, _ = kpts.shape
    n_limbs = int(limbs.shape[0])
    hw = hout * wout

    gx = kpts[..., 0] / sx  # [B, M, P] grid coords
    gy = kpts[..., 1] / sy
    cxi = jnp.floor(gx).astype(jnp.int32)
    cyi = jnp.floor(gy).astype(jnp.int32)
    inb = valid & (cxi >= 0) & (cxi < wout) & (cyi >= 0) & (cyi < hout)
    cell = (
        jnp.clip(cyi, 0, hout - 1) * wout + jnp.clip(cxi, 0, wout - 1)
    )  # [B, M, P]

    tx = gx - cxi.astype(jnp.float32)
    ty = gy - cyi.astype(jnp.float32)
    # Box sizes: parts max(bbox)/8, Instance anchor /4, normalized to input.
    size = jnp.maximum(bbxs[..., 2], bbxs[..., 3])  # [B, M]
    part_px = size / 8.0
    inst_px = size / 4.0
    is_inst = (jnp.arange(p) == instance_idx)[None, None, :]
    size_px = jnp.where(is_inst, inst_px[..., None], part_px[..., None])
    tw = size_px / win
    th = size_px / hin

    okf = inb.astype(jnp.float32)

    def scatter_maps(cell_b, ok_b, vals_b):
        """cell/ok [M, P], vals [V, M, P] -> count [P, HW], sums [V, P, HW]."""
        flat = cell_b.reshape(-1)  # [M*P]
        part = jnp.tile(jnp.arange(p, dtype=jnp.int32), (m,))
        idx = part * hw + flat
        count = jnp.zeros((p * hw,), jnp.float32).at[idx].add(
            ok_b.reshape(-1)
        )
        sums = jnp.zeros((vals_b.shape[0], p * hw), jnp.float32).at[
            :, idx
        ].add(vals_b.reshape(vals_b.shape[0], -1) * ok_b.reshape(-1))
        return count.reshape(p, hout, wout), sums.reshape(-1, p, hout, wout)

    vals = jnp.stack([tx, ty, tw, th], axis=1)  # [B, 4, M, P]
    count, sums = jax.vmap(scatter_maps)(cell, okf, vals)
    denom = jnp.maximum(count, 1.0)
    c = jnp.clip(count, 0.0, 1.0)
    x_t, y_t, w_t, h_t = [sums[:, i] / denom for i in range(4)]

    def to_nhwc(t):
        return t.transpose(0, 2, 3, 1)

    # Edge tensor: source cell -> neighborhood offset of the target cell.
    s_idx, d_idx = limbs[:, 0], limbs[:, 1]
    scy, scx = cyi[:, :, s_idx], cxi[:, :, s_idx]   # [B, M, L]
    dcy, dcx = cyi[:, :, d_idx], cxi[:, :, d_idx]
    s_ok = inb[:, :, s_idx]
    d_ok = inb[:, :, d_idx]
    di = dcy - scy + hnei // 2
    dj = dcx - scx + wnei // 2
    nei_ok = (di >= 0) & (di < hnei) & (dj >= 0) & (dj < wnei)
    edge_ok = (s_ok & d_ok & nei_ok).astype(jnp.float32)
    mask_ok = (s_ok & d_ok).astype(jnp.float32)

    n_win = hnei * wnei
    scell = (
        jnp.clip(scy, 0, hout - 1) * wout + jnp.clip(scx, 0, wout - 1)
    )  # [B, M, L]
    noff = jnp.clip(di, 0, hnei - 1) * wnei + jnp.clip(dj, 0, wnei - 1)

    def scatter_edges(scell_b, noff_b, eok_b, mok_b):
        """[M, L] each -> e [L, NEI, HW], e_mask [L, NEI, HW]."""
        limb = jnp.tile(jnp.arange(n_limbs, dtype=jnp.int32), (m, 1))
        e_idx = (limb * n_win + noff_b) * hw + scell_b
        e = jnp.zeros((n_limbs * n_win * hw,), jnp.float32).at[
            e_idx.reshape(-1)
        ].add(eok_b.reshape(-1))
        em_idx = limb * hw + scell_b
        em = jnp.zeros((n_limbs * hw,), jnp.float32).at[
            em_idx.reshape(-1)
        ].add(mok_b.reshape(-1))
        e = e.reshape(n_limbs, n_win, hw)
        em = jnp.broadcast_to(em.reshape(n_limbs, 1, hw), e.shape)
        return jnp.clip(e, 0.0, 1.0), jnp.clip(em, 0.0, 1.0)

    e, e_mask = jax.vmap(scatter_edges)(scell, noff, edge_ok, mask_ok)
    e = e.reshape(b, n_limbs, hnei, wnei, hout, wout)
    e_mask = e_mask.reshape(b, n_limbs, hnei, wnei, hout, wout)

    return {
        "c": to_nhwc(c), "x": to_nhwc(x_t), "y": to_nhwc(y_t),
        "w": to_nhwc(w_t), "h": to_nhwc(h_t), "e": e, "e_mask": e_mask,
    }


# ---------------------------------------------------------------------------
# PifPaf: composite intensity (CIF) + association (CAF) fields
# ---------------------------------------------------------------------------

def _person_scales(
    kpts: jnp.ndarray, valid: jnp.ndarray, stride: float,
    sigmas: np.ndarray | None, n_parts: int,
) -> jnp.ndarray:
    """Per-keypoint scale targets in feature-grid units from the visible
    bounding-box area heuristic (reference: pifpaf/utils.py:49-78 get_scale)."""
    big = 1e6
    x = jnp.where(valid, kpts[..., 0], big)
    y = jnp.where(valid, kpts[..., 1], big)
    xmin = jnp.min(x, axis=-1)
    ymin = jnp.min(y, axis=-1)
    x = jnp.where(valid, kpts[..., 0], -big)
    y = jnp.where(valid, kpts[..., 1], -big)
    xmax = jnp.max(x, axis=-1)
    ymax = jnp.max(y, axis=-1)
    extent = jnp.sqrt(
        jnp.clip((xmax - xmin) * (ymax - ymin), 1.0, None)
    )  # [B, M] person size in px
    if sigmas is None:
        sig = jnp.full((n_parts,), 0.05, jnp.float32)
    else:
        sig = jnp.asarray(sigmas, jnp.float32)[:n_parts]
    scale_px = jnp.maximum(extent[..., None] * sig * 4.0, 4.0)  # [B, M, P]
    return scale_px / stride


def pifpaf_targets(
    kpts: jnp.ndarray, valid: jnp.ndarray, limbs: np.ndarray,
    in_hw: tuple[int, int], out_hw: tuple[int, int],
    mask: jnp.ndarray | None = None,
    side: int = 1, n_samples: int = 9, bmin: float = 0.1,
    sigmas: np.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """CIF/CAF composite-field targets with NaN don't-care semantics.

    Keys (all [B, hout, wout, ...]): pif_conf/pif_bmin/pif_scale [.., P],
    pif_vec [.., P, 2], paf_conf/paf_*_bmin/paf_*_scale [.., L],
    paf_src_vec/paf_dst_vec [.., L, 2].

    Vector targets are offsets from the grid cell to the keypoint in
    feature-grid units; scale targets are raw grid-unit sizes (the model
    predicts them through softplus). Cells not written by any person are NaN
    for regression channels (the losses mask NaN, models/pifpaf.py) and 0 for
    confidence; `mask` == 0 regions become NaN everywhere
    (reference: pifpaf/utils.py:117-240 put_pifmap/put_pafmap — NaN padding,
    nearest-cell patch writes, line-sampled CAF fields).
    """
    if sigmas is None:
        from ..utils.topology import COCO_SIGMAS

        sigmas = COCO_SIGMAS
    limbs = jnp.asarray(limbs, jnp.int32)
    hin, win = in_hw
    hout, wout = out_hw
    stride = hin / hout
    b, m, p, _ = kpts.shape
    n_limbs = int(limbs.shape[0])
    hw = hout * wout
    nan = jnp.float32(jnp.nan)

    g = kpts / stride  # [B, M, P, 2] feature-grid coords
    scales = _person_scales(kpts, valid, stride, sigmas, p)  # [B, M, P]

    # --- CIF: write a (2*side+1)^2 patch around each keypoint -------------
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-side, side + 1), jnp.arange(-side, side + 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 2)  # [O, 2] (dy, dx)
    n_off = offs.shape[0]
    base = jnp.floor(g).astype(jnp.int32)  # [B, M, P, 2] (x, y)
    cx = base[..., 0][..., None] + offs[None, None, None, :, 1]  # [B,M,P,O]
    cy = base[..., 1][..., None] + offs[None, None, None, :, 0]
    ok = (
        valid[..., None] & (cx >= 0) & (cx < wout) & (cy >= 0) & (cy < hout)
    )
    cell = jnp.clip(cy, 0, hout - 1) * wout + jnp.clip(cx, 0, wout - 1)
    vx = g[..., 0][..., None] - cx.astype(jnp.float32)  # offset cell->kpt
    vy = g[..., 1][..., None] - cy.astype(jnp.float32)
    sc = jnp.broadcast_to(scales[..., None], ok.shape)

    okf = ok.astype(jnp.float32)

    def scatter_pif(cell_b, ok_b, vals_b):
        """cell/ok [M, P, O], vals [V, M, P, O] -> (count, sums) over [P,HW]."""
        part = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.int32)[None, :, None], cell_b.shape
        )
        idx = (part * hw + cell_b).reshape(-1)
        okv = ok_b.reshape(-1)
        count = jnp.zeros((p * hw,), jnp.float32).at[idx].add(okv)
        sums = jnp.zeros((vals_b.shape[0], p * hw), jnp.float32).at[
            :, idx
        ].add(vals_b.reshape(vals_b.shape[0], -1) * okv)
        return count, sums

    pif_vals = jnp.stack([vx, vy, sc], axis=1)  # [B, 3, M, P, O]
    count, sums = jax.vmap(scatter_pif)(cell, okf, pif_vals)
    count = count.reshape(b, p, hout, wout).transpose(0, 2, 3, 1)
    sums = sums.reshape(b, 3, p, hout, wout).transpose(0, 3, 4, 2, 1)
    hit = count > 0
    denom = jnp.maximum(count, 1.0)
    pif_conf = jnp.clip(count, 0.0, 1.0)
    pif_vec = jnp.where(
        hit[..., None], sums[..., 0:2] / denom[..., None], nan
    )
    pif_scale = jnp.where(hit, sums[..., 2] / denom, nan)
    pif_bmin = jnp.where(hit, jnp.float32(bmin), nan)

    # --- CAF: sample cells along each bone ---------------------------------
    s_idx, d_idx = limbs[:, 0], limbs[:, 1]
    gs = g[:, :, s_idx]  # [B, M, L, 2]
    gd = g[:, :, d_idx]
    lok = valid[:, :, s_idx] & valid[:, :, d_idx]  # [B, M, L]
    ss = scales[:, :, s_idx]
    ds = scales[:, :, d_idx]

    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    pos = gs[..., None, :] + t[None, None, None, :, None] * (
        gd - gs
    )[..., None, :]  # [B, M, L, S, 2]
    pcx = jnp.round(pos[..., 0]).astype(jnp.int32)
    pcy = jnp.round(pos[..., 1]).astype(jnp.int32)
    pok = (
        lok[..., None]
        & (pcx >= 0) & (pcx < wout) & (pcy >= 0) & (pcy < hout)
    )
    pcell = jnp.clip(pcy, 0, hout - 1) * wout + jnp.clip(pcx, 0, wout - 1)
    svx = gs[..., 0][..., None] - pcx.astype(jnp.float32)
    svy = gs[..., 1][..., None] - pcy.astype(jnp.float32)
    dvx = gd[..., 0][..., None] - pcx.astype(jnp.float32)
    dvy = gd[..., 1][..., None] - pcy.astype(jnp.float32)
    ssb = jnp.broadcast_to(ss[..., None], pok.shape)
    dsb = jnp.broadcast_to(ds[..., None], pok.shape)

    pokf = pok.astype(jnp.float32)

    def scatter_paf(cell_b, ok_b, vals_b):
        limb = jnp.broadcast_to(
            jnp.arange(n_limbs, dtype=jnp.int32)[None, :, None], cell_b.shape
        )
        idx = (limb * hw + cell_b).reshape(-1)
        okv = ok_b.reshape(-1)
        count = jnp.zeros((n_limbs * hw,), jnp.float32).at[idx].add(okv)
        sums = jnp.zeros((vals_b.shape[0], n_limbs * hw), jnp.float32).at[
            :, idx
        ].add(vals_b.reshape(vals_b.shape[0], -1) * okv)
        return count, sums

    paf_vals = jnp.stack([svx, svy, dvx, dvy, ssb, dsb], axis=1)
    pcount, psums = jax.vmap(scatter_paf)(pcell, pokf, paf_vals)
    pcount = pcount.reshape(b, n_limbs, hout, wout).transpose(0, 2, 3, 1)
    psums = psums.reshape(b, 6, n_limbs, hout, wout).transpose(0, 3, 4, 2, 1)
    phit = pcount > 0
    pden = jnp.maximum(pcount, 1.0)
    paf_conf = jnp.clip(pcount, 0.0, 1.0)

    def reg(i):
        return jnp.where(phit, psums[..., i] / pden, nan)

    paf_src_vec = jnp.stack([reg(0), reg(1)], axis=-1)
    paf_dst_vec = jnp.stack([reg(2), reg(3)], axis=-1)
    paf_src_scale = reg(4)
    paf_dst_scale = reg(5)
    paf_src_bmin = jnp.where(phit, jnp.float32(bmin), nan)
    paf_dst_bmin = jnp.where(phit, jnp.float32(bmin), nan)

    out = {
        "pif_conf": pif_conf, "pif_vec": pif_vec, "pif_bmin": pif_bmin,
        "pif_scale": pif_scale,
        "paf_conf": paf_conf, "paf_src_vec": paf_src_vec,
        "paf_dst_vec": paf_dst_vec, "paf_src_bmin": paf_src_bmin,
        "paf_dst_bmin": paf_dst_bmin, "paf_src_scale": paf_src_scale,
        "paf_dst_scale": paf_dst_scale,
    }
    if mask is not None:
        care = mask.reshape(b, hout, wout) > 0.5
        for k, v in out.items():
            c = care[..., None, None] if v.ndim == 5 else care[..., None]
            out[k] = jnp.where(jnp.broadcast_to(c, v.shape), v, nan)
    return out
