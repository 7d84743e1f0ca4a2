"""TPU-native PoseProposal decoder.

Fixed-shape XLA redesign of the reference's CPU parser
(reference: src/pose_proposal.cpp:68-337 and
hyperpose/Model/pose_proposal/processor.py:55-204): per-part box NMS, edge
gathers from the [L, hnei, wnei, H, W] tensor, greedy global-max bipartite
matching per limb, and tree-ordered person-id propagation — all bounded
shapes, vectorized over batch via vmap.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.topology import PPN_TOPOLOGY, Topology
from .paf_decode import DecodedSkeletons

_NEG = -1e30


@dataclasses.dataclass(frozen=True)
class PpnDecoderConfig:
    max_boxes: int = 16          # kept proposals per part after NMS
    max_humans: int = 16
    thresh_part_score: float = 0.2   # reference: processor.py:42
    thresh_edge_score: float = 0.2
    thresh_nms_iou: float = 0.3
    min_parts: int = 4
    instance_part: int = 1       # PpnCocoPart.Instance
    # Measured negative result (round 4): a 3x3 confidence-weighted
    # soft-argmax coordinate refinement was tried and REMOVED — it costs
    # ~2 AP on trained checkpoints (0.642 vs 0.663 tune-split) because the
    # loss trains non-gt cells toward their OWN cell centers (the
    # half-offset prior, models/pose_proposal.py:111), so neighbor
    # coordinates carry no information about the keypoint and the average
    # drags predictions toward cell centers.


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """[K,4] center-format boxes -> [K,K] IoU."""
    x, y, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x1, x2 = x - w / 2, x + w / 2
    y1, y2 = y - h / 2, y + h / 2
    ix = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :]), 0.0
    )
    iy = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :]), 0.0
    )
    inter = ix * iy
    area = w * h
    union = area[:, None] + area[None, :] - inter + 1e-6
    return inter / union


def _per_part_nms(boxes, scores, valid, iou_thresh):
    """Greedy NMS over score-sorted boxes [P, K, 4]; returns keep mask.

    Matches non_maximium_supress (reference:
    pose_proposal/utils.py:204-230). Boxes arrive sorted by score desc.
    """
    p, k, _ = boxes.shape
    iou = jax.vmap(_iou_matrix)(boxes)                    # [P,K,K]

    # Dense greedy fixpoint (same scheme as paf_decode._greedy_connections):
    # box i is kept iff valid and no kept EARLIER box overlaps >= thresh.
    # Each round is one [P,K,K] masked any; decision i is final by round i,
    # and any stable round equals the round-K result, so exit early.
    conflicts = (
        jnp.arange(k)[None, :, None] > jnp.arange(k)[None, None, :]
    ) & (iou >= iou_thresh)                               # [P, K(i), K(j<i)]

    def cond(state):
        i, _, changed = state
        return (i < k) & changed

    def body(state):
        i, keep, _ = state
        sup = jnp.any(conflicts & keep[:, None, :], axis=-1)
        new = valid & ~sup
        return i + 1, new, jnp.any(new != keep)

    _, keep, _ = lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True))
    )
    return keep


def _decode_one(predict: dict, cfg: PpnDecoderConfig, limbs: np.ndarray,
                hnei: int, wnei: int, in_hw: tuple[int, int]):
    """Decode one image. predict maps are [hout, wout, K]-leading; e is
    [L, hnei, wnei, hout, wout]; x/y/w/h already restored to input pixels."""
    pc, px, py = predict["c"], predict["x"], predict["y"]
    pw, ph, pe = predict["w"], predict["h"], predict["e"]
    hout, wout, p = pc.shape
    n = hout * wout
    k = min(cfg.max_boxes, n)
    l = limbs.shape[0]

    # Top-K cells per part by score.
    scores_flat = pc.reshape(n, p).T                      # [P, N]
    top_scores, top_idx = lax.top_k(scores_flat, k)       # [P, K]
    valid = top_scores > cfg.thresh_part_score
    cell_y = top_idx // wout
    cell_x = top_idx % wout

    def g(m):
        return jnp.take_along_axis(m.reshape(n, p).T, top_idx, axis=1)

    bx, by, bw, bh = g(px), g(py), g(pw), g(ph)           # [P, K]
    boxes = jnp.stack([bx, by, bw, bh], axis=-1)
    keep = _per_part_nms(boxes, top_scores, valid, cfg.thresh_nms_iou)
    scores = jnp.where(keep, top_scores, 0.0)

    # Edge scores between kept proposals of each limb's endpoint parts
    # (reference: processor.py:125-137 e_score gather + threshold).
    src_p, dst_p = limbs[:, 0], limbs[:, 1]
    sy, sx = cell_y[src_p], cell_x[src_p]                 # [L, K]
    dy_, dx_ = cell_y[dst_p], cell_x[dst_p]
    ddy = dy_[:, None, :] - sy[:, :, None]                # [L, K, K]
    ddx = dx_[:, None, :] - sx[:, :, None]
    in_nei = (jnp.abs(ddy) <= hnei // 2) & (jnp.abs(ddx) <= wnei // 2)
    ey = jnp.clip(ddy + hnei // 2, 0, hnei - 1)
    ex = jnp.clip(ddx + wnei // 2, 0, wnei - 1)
    # Gather e[l, ey, ex, sy, sx] for every (l, i, j).
    e_flat = pe.reshape(l, hnei * wnei * hout * wout)
    flat_idx = (
        (ey * wnei + ex) * (hout * wout) + sy[:, :, None] * wout + sx[:, :, None]
    ).reshape(l, -1)
    e_val = jnp.take_along_axis(e_flat, flat_idx, axis=1).reshape(l, k, k)
    e_val = jnp.where(
        in_nei & (e_val >= cfg.thresh_edge_score), e_val, 0.0
    )
    match = (
        scores[src_p][:, :, None] * e_val * scores[dst_p][:, None, :]
    )
    match = jnp.where(
        keep[src_p][:, :, None] & keep[dst_p][:, None, :], match, 0.0
    )

    # Greedy global-max matching per limb (reference: processor.py:141-176):
    # up to K rounds of (pick max, zero its row+column), vectorized over
    # limbs; exits as soon as no limb has a positive candidate left.
    def match_body(state):
        _i, m, dst_to_src = state
        flat = m.reshape(l, k * k)
        best = jnp.argmax(flat, axis=1)                   # [L]
        best_val = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
        bi = best // k
        bj = best % k
        ok = best_val > 0.0
        dst_to_src = jnp.where(
            ok[:, None] & (jnp.arange(k)[None, :] == bj[:, None]),
            bi[:, None], dst_to_src,
        )
        row_mask = jnp.arange(k)[None, :] == bi[:, None]  # [L,K]
        col_mask = jnp.arange(k)[None, :] == bj[:, None]
        zero = row_mask[:, :, None] | col_mask[:, None, :]
        m = jnp.where(ok[:, None, None] & zero, 0.0, m)
        return _i + 1, m, dst_to_src

    def match_cond(state):
        i, m, _ = state
        return (i < k) & jnp.any(m > 0.0)

    dst_to_src0 = jnp.full((l, k), -1, jnp.int32)
    _, _, dst_to_src = lax.while_loop(
        match_cond, match_body, (jnp.int32(0), match, dst_to_src0)
    )

    # Person-id propagation down the limb tree (reference:
    # processor.py:138-181): instance proposals seed ids; each limb copies
    # the source slot's id into its matched destination slot. The limb list
    # is topologically ordered, so one unrolled pass suffices.
    assem = jnp.full((p, k), -1, jnp.int32)
    inst = cfg.instance_part
    assem = assem.at[inst].set(
        jnp.where(keep[inst], jnp.arange(k, dtype=jnp.int32), -1)
    )
    for li in range(l):
        sp, dp = int(limbs[li, 0]), int(limbs[li, 1])
        d2s = dst_to_src[li]                              # [K]
        src_assem = jnp.where(d2s >= 0, assem[sp][jnp.clip(d2s, 0)], -1)
        assem = assem.at[dp].set(
            jnp.where((d2s >= 0) & keep[dp], src_assem, assem[dp])
        )

    # Fixed-shape humans: human h <-> instance slot h.
    mh = cfg.max_humans
    hin, win = in_hw
    human_ids = jnp.arange(mh, dtype=jnp.int32)           # instance slots
    member = assem[None, :, :] == human_ids[:, None, None]  # [MH, P, K]
    member = member & keep[None, :, :] & (human_ids[:, None, None] >= 0)
    part_score = jnp.max(
        jnp.where(member, scores[None], _NEG), axis=-1
    )                                                     # [MH, P]
    best_k = jnp.argmax(jnp.where(member, scores[None], _NEG), axis=-1)
    part_valid = part_score > _NEG * 0.5
    part_score = jnp.where(part_valid, part_score, 0.0)

    parts_idx = jnp.arange(p)[None, :]
    coords = jnp.stack([
        bx[parts_idx, best_k] / win, by[parts_idx, best_k] / hin
    ], axis=-1)
    coords = jnp.where(part_valid[..., None], coords, 0.0)

    n_parts = jnp.sum(part_valid, axis=-1)
    inst_valid = keep[inst][:mh] if k >= mh else jnp.pad(
        keep[inst], (0, mh - k)
    )[:mh]
    human_valid = inst_valid & (n_parts >= cfg.min_parts)
    human_score = jnp.where(human_valid, jnp.sum(part_score, axis=-1), 0.0)
    part_valid = part_valid & human_valid[:, None]
    return coords, part_score, part_valid, human_score, human_valid


@functools.partial(
    jax.jit, static_argnames=("cfg", "hnei", "wnei", "in_hw", "topology")
)
def ppn_decode_batch(
    predict: dict,
    cfg: PpnDecoderConfig = PpnDecoderConfig(),
    hnei: int = 9,
    wnei: int = 9,
    in_hw: tuple[int, int] = (384, 384),
    topology: Topology = PPN_TOPOLOGY,
) -> DecodedSkeletons:
    """Batched decode. predict: dict of NHWC maps ({c,i,x,y,w,h} as
    [B, hout, wout, K]; e as [B, L, hnei, wnei, hout, wout]); x/y/w/h must
    be restored to input-pixel units (model.restore_coor)."""
    limbs = np.asarray(topology.limbs)

    def one(args):
        return _decode_one(args, cfg, limbs, hnei, wnei, in_hw)

    coords, part_scores, part_valid, scores, valid = jax.vmap(one)(predict)
    return DecodedSkeletons(coords, part_scores, part_valid, scores, valid)
