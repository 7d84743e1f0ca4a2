"""Sequential reference-semantics PAF decoder (numpy).

A direct transcription of the reference algorithm (reference:
src/paf.cpp:95-272 get_connection_candidates/get_connections/get_humans)
operating at feature resolution with the same knobs as the device decoder.
Used as the golden model to cross-validate the vectorized implementation.
"""
from __future__ import annotations

import numpy as np

from hyperpose_tpu.ops.paf_decode import PafDecoderConfig
from hyperpose_tpu.utils.topology import COCO_TOPOLOGY


def golden_decode(
    peak_xy: np.ndarray,      # [P, K, 2] float (x, y) feature coords
    peak_score: np.ndarray,   # [P, K]
    peak_valid: np.ndarray,   # [P, K]
    paf: np.ndarray,          # [H, W, 2L]
    cfg: PafDecoderConfig,
    topology=COCO_TOPOLOGY,
):
    """Returns a list of humans: dicts part_idx -> (x, y, score), with
    'score' and 'n_parts' keys. Consumes the SAME peak set as the device
    decoder so only connection scoring/greedy/assembly are compared."""
    h, w, _ = paf.shape
    limbs = np.asarray(topology.limbs)
    l = limbs.shape[0]
    s = cfg.n_samples

    # --- candidates + greedy per limb (paf.cpp:95-137, 234-272) ----------
    connections_per_limb = []
    for li in range(l):
        a, b = int(limbs[li, 0]), int(limbs[li, 1])
        cands = []
        for i in range(peak_xy.shape[1]):
            if not peak_valid[a, i]:
                continue
            for j in range(peak_xy.shape[1]):
                if not peak_valid[b, j]:
                    continue
                pa = peak_xy[a, i]
                pb = peak_xy[b, j]
                diff = pb - pa
                norm = float(np.hypot(*diff))
                if norm < 1e-6:
                    continue
                unit = diff / norm
                scores = 0.0
                crit1 = 0
                for t in range(s):
                    loc = np.floor(pa + diff * (t / s) + 0.5).astype(int)
                    x = min(max(loc[0], 0), w - 1)
                    y = min(max(loc[1], 0), h - 1)
                    v = unit[0] * paf[y, x, 2 * li] + unit[1] * paf[y, x, 2 * li + 1]
                    scores += v
                    if v > cfg.paf_thresh:
                        crit1 += 1
                crit2 = scores / s + min(
                    0.0, 0.5 * h / (cfg.upsample * norm) - 1.0
                )
                if crit1 > cfg.crit1_thresh and crit2 > 0:
                    cands.append((crit2, i, j))
        cands.sort(key=lambda c: -c[0])
        conns = []
        for score, i, j in cands:
            if any(ci == i or cj == j for _, ci, cj in conns):
                continue
            conns.append((score, i, j))
        connections_per_limb.append(conns)

    # --- assembly as connected components + component scores --------------
    # (the device decoder's documented equivalent of get_humans merging)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    conn_score_sum = {}
    nodes = set()
    for li in range(l):
        a, b = int(limbs[li, 0]), int(limbs[li, 1])
        for score, i, j in connections_per_limb[li]:
            u = (a, i)
            v = (b, j)
            nodes.add(u)
            nodes.add(v)
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            union(u, v)
            conn_score_sum[(li, i, j)] = score

    comps = {}
    for node in nodes:
        comps.setdefault(find(node), []).append(node)

    humans = []
    for root, members in comps.items():
        parts = {}
        for (p, k) in members:
            if p not in parts or peak_score[p, k] > parts[p][2]:
                parts[p] = (peak_xy[p, k, 0], peak_xy[p, k, 1],
                            peak_score[p, k])
        conn_total = 0.0
        for li in range(l):
            a, b = int(limbs[li, 0]), int(limbs[li, 1])
            for score, i, j in connections_per_limb[li]:
                if find((a, i)) == root:
                    conn_total += score
        peak_total = sum(peak_score[p, k] for (p, k) in members)
        score = peak_total + conn_total
        n_parts = len(parts)
        if n_parts >= cfg.min_parts and score / n_parts >= cfg.min_human_score:
            humans.append({
                "parts": parts, "score": score, "n_parts": n_parts,
            })
    humans.sort(key=lambda hm: -hm["score"])
    return humans
