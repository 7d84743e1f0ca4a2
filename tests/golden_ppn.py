"""Sequential golden model of the PoseProposal decoder.

A direct transcription of the reference algorithm (reference:
hyperpose/Model/pose_proposal/processor.py:65-204 process_one and
utils.py:204-230 non_maximium_supress; same structure as
src/pose_proposal.cpp:68-337): per-part score filter + greedy IoU NMS,
edge-score gather from the [L, hnei, wnei, H, W] tensor, per-limb greedy
global-max matching, instance-id propagation, part-count filter.

Used only as the cross-validation oracle for the vectorized device decoder.
"""
from __future__ import annotations

import numpy as np


def _iou(b1, b2):
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    ix = max(
        min(x1 + w1 / 2, x2 + w2 / 2) - max(x1 - w1 / 2, x2 - w2 / 2), 0.0
    )
    iy = max(
        min(y1 + h1 / 2, y2 + h2 / 2) - max(y1 - h1 / 2, y2 - h2 / 2), 0.0
    )
    inter = ix * iy
    union = w1 * h1 + w2 * h2 - inter + 1e-6
    return inter / union


def _nms(bbxs, scores, thresh):
    """Greedy NMS returning kept indices (reference: utils.py:204-230)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if all(_iou(bbxs[i], bbxs[j]) < thresh for j in keep):
            keep.append(i)
    return np.asarray(keep, np.int64)


def golden_decode(
    pc, px, py, pw, ph, pe, limbs,
    thresh_part_score=0.2, thresh_edge_score=0.2, thresh_nms_iou=0.3,
    min_parts=4, instance_part=1,
):
    """One image. pc/px/py/pw/ph: [hout, wout, P]; pe: [L, hnei, wnei,
    hout, wout]. Returns list of humans {part_idx: (x, y, score)}."""
    hout, wout, n_pos = pc.shape
    n_limbs, hnei, wnei = pe.shape[:3]
    n = hout * wout

    pcs = np.clip(pc, 0.0, np.inf).reshape(n, n_pos).T       # [P, N]
    pxs = px.reshape(n, n_pos).T
    pys = py.reshape(n, n_pos).T
    pws = pw.reshape(n, n_pos).T
    phs = ph.reshape(n, n_pos).T
    pe = np.clip(pe, 0.0, np.inf)

    bbxs_list, scores_list, ids_list, assems = [], [], [], []
    for p in range(n_pos):
        bbxs = np.stack([pxs[p], pys[p], pws[p], phs[p]], axis=-1)
        scores = pcs[p]
        fil = np.where(scores > thresh_part_score)[0]
        keep = _nms(bbxs[fil], scores[fil], thresh_nms_iou)
        bbxs_list.append(bbxs[fil][keep])
        scores_list.append(scores[fil][keep])
        ids_list.append(fil[keep])
        assems.append(np.full(len(keep), -1, np.int64))

    # Dense cell-pair edge scores (reference: processor.py:125-137).
    e_score = np.zeros((n_limbs, n, n))
    for li in range(n_limbs):
        for src_id in range(n):
            sy, sx = src_id // wout, src_id % wout
            for dst_id in range(n):
                dy_, dx_ = dst_id // wout, dst_id % wout
                ddy, ddx = dy_ - sy, dx_ - sx
                if abs(ddy) > hnei // 2 or abs(ddx) > wnei // 2:
                    continue
                e_score[li, src_id, dst_id] = pe[
                    li, ddy + hnei // 2, ddx + wnei // 2, sy, sx
                ]
    e_score *= e_score >= thresh_edge_score

    assems[instance_part][:] = np.arange(len(assems[instance_part]))

    for li, (sp, dp) in enumerate(limbs):
        ss, si = scores_list[sp], ids_list[sp]
        ds, di = scores_list[dp], ids_list[dp]
        match = np.zeros((len(ss), len(ds)))
        for i in range(len(ss)):
            for j in range(len(ds)):
                match[i, j] = ss[i] * e_score[li, si[i], di[j]] * ds[j]
        for _ in range(min(len(ss), len(ds))):
            mx = match.max() if match.size else 0.0
            if mx == 0.0:
                break
            i, j = np.unravel_index(np.argmax(match), match.shape)
            assems[dp][j] = assems[sp][i]
            match[i, :] = 0.0
            match[:, j] = 0.0

    n_humans = len(assems[instance_part])
    humans = [dict() for _ in range(n_humans)]
    for p in range(n_pos):
        for bbx, score, assem in zip(bbxs_list[p], scores_list[p], assems[p]):
            if assem == -1:
                continue
            humans[int(assem)][p] = (float(bbx[0]), float(bbx[1]),
                                     float(score))
    return [h for h in humans if len(h) >= min_parts]
