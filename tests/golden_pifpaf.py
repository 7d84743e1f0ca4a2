"""Sequential numpy transcription of the reference PifPaf decoder — TEST
ORACLE ONLY, never imported by the package.

Transcribes the complete reference decode path end to end
(reference: hyperpose/Model/pifpaf/processor.py:89-393 process_one +
utils.py:242-296 add_gaussian/get_hr_conf, restore at utils.py:327-341):
dense hi-res CIF accumulation, seed generation, forward/backward CAF lists
with CIF_FLOOR rescoring, occupancy-guided sequential heapq growth with
2-best blending and reverse matching, keypoint-wise NMS, and the
part-count/score human filter. Inputs are RESTORED maps in the reference
layout (conf [P,H,W], vec [P,2,H,W] in input pixels, scale [P,H,W] px).

Faithful quirks preserved:
  - put_occupy runs for ALL 17 parts of a grown annotation, including
    unassigned ones at (0, 0, scale 0) — occupying the image corner
    (processor.py:177-179)
  - field_to_scalar uses np.round (banker's rounding) int sampling
  - seeds sort as raw tuples (score, part, x, y, scale), so exact ties
    break by part index then coordinates (processor.py:128)
"""
import heapq

import numpy as np

THRESH_PIF = 0.3
THRESH_PAF = 0.1
THRESH_REF_PIF = 0.3
THRESH_REF_PAF = 0.1
THRESH_GEN_REF_PIF = 0.1
CIF_FLOOR = 0.1
REDUCTION = 2
MIN_SCALE = 4
PART_NUM_THRESH = 4
SCORE_THRESH = 0.1


def add_gaussian(hr_conf, confs, vecs, scales, truncate=1.0, max_value=1.0,
                 neighbor_num=16):
    """(reference: pifpaf/utils.py:242-273)"""
    field_h, field_w = hr_conf.shape
    for conf, vec, scale in zip(confs, vecs, scales):
        x, y = vec
        min_x = int(np.clip(x - truncate * scale, 0, field_w - 1))
        max_x = int(np.clip(x + truncate * scale + 1, min_x + 1, field_w))
        min_y = int(np.clip(y - truncate * scale, 0, field_h - 1))
        max_y = int(np.clip(y + truncate * scale + 1, min_y + 1, field_h))
        x_range = np.linspace(min_x, max_x - 1, max_x - min_x)
        y_range = np.linspace(min_y, max_y - 1, max_y - min_y)
        mesh_x, mesh_y = np.meshgrid(x_range, y_range)
        mesh_dist = (mesh_x - x) ** 2 + (mesh_y - y) ** 2
        mesh_mask = mesh_dist <= (scale * truncate) ** 2
        mesh_update = conf * np.exp(-0.5 * mesh_dist / (scale ** 2))
        cx, cy = int(np.round(x)), int(np.round(y))
        if min_x <= cx < max_x and min_y <= cy < max_y:
            mesh_update[cy - min_y, cx - min_x] = conf
        hr_conf[min_y:max_y, min_x:max_x][mesh_mask] += (
            mesh_update[mesh_mask] / neighbor_num
        )
    return np.clip(hr_conf, 0.0, max_value)


def get_hr_conf(conf_map, vec_map, scale_map, stride=8,
                thresh=THRESH_GEN_REF_PIF):
    """(reference: pifpaf/utils.py:275-296)"""
    field_num, hout, wout = conf_map.shape
    hr = np.zeros((field_num, (hout - 1) * stride + 1,
                   (wout - 1) * stride + 1))
    for f in range(field_num):
        m = conf_map[f] > thresh
        hr[f] = add_gaussian(
            hr[f], conf_map[f][m], vec_map[f, :, m], scale_map[f][m]
        )
    return hr


def field_to_scalar(vec_x, vec_y, scalar_map):
    """(reference: processor.py:210-220)"""
    h, w = scalar_map.shape
    out = np.zeros(vec_x.shape[0])
    for i in range(vec_x.shape[0]):
        x = int(np.round(vec_x[i]))
        y = int(np.round(vec_y[i]))
        if 0 <= x < w and 0 <= y < h:
            out[i] = scalar_map[y, x]
    return out


def check_occupy(occupied, pos_idx, x, y, reduction=REDUCTION):
    _, fh, fw = occupied.shape
    x = int(np.round(x / reduction))
    y = int(np.round(y / reduction))
    if x < 0 or x >= fw or y < 0 or y >= fh:
        return True
    return occupied[pos_idx, y, x] != 0


def put_occupy(occupied, pos_idx, x, y, scale, reduction=REDUCTION,
               min_scale=MIN_SCALE, value=1):
    _, fh, fw = occupied.shape
    x, y = np.round(x / reduction), np.round(y / reduction)
    size = np.round(max(min_scale / reduction, scale / reduction))
    min_x = max(0, int(x - size))
    max_x = max(min_x + 1, min(fw, int(x + size) + 1))
    min_y = max(0, int(y - size))
    max_y = max(min_y + 1, min(fh, int(y + size) + 1))
    occupied[pos_idx, min_y:max_y, min_x:max_x] += value
    return occupied


def find_connection(connections, x, y, scale, thresh_second=0.01):
    """(reference: processor.py:262-310, connection_method='blend')"""
    sigma_f = 2.0 * scale
    sigma_g = 0.25 * scale ** 2
    first_idx, first_score = -1, 0.0
    second_idx, second_score = -1, 0.0
    score_f, src_x, src_y, _, dst_x, dst_y, dst_scale = connections
    for i in range(score_f.shape[0]):
        cx, cy = src_x[i], src_y[i]
        if x < cx - sigma_f or x > cx + sigma_f:
            continue
        if y < cy - sigma_f or y > cy + sigma_f:
            continue
        d = (cx - x) ** 2 + (cy - y) ** 2
        w = np.exp(-0.5 * d / sigma_g) * score_f[i]
        if w > first_score:
            second_idx, second_score = first_idx, first_score
            first_idx, first_score = i, w
        elif w > second_score:
            second_idx, second_score = i, w
    if first_idx == -1 or first_score == 0.0:
        return 0.0, 0.0, 0.0, 0.0
    if (second_idx == -1 or second_score < thresh_second
            or second_score < 0.5 * first_score):
        return (first_score * 0.5, dst_x[first_idx], dst_y[first_idx],
                dst_scale[first_idx])
    d12 = ((dst_x[first_idx] - dst_x[second_idx]) ** 2
           + (dst_y[first_idx] - dst_y[second_idx]) ** 2)
    if d12 > dst_scale[first_idx] ** 2 / 4.0:
        return (first_score * 0.5, dst_x[first_idx], dst_y[first_idx],
                dst_scale[first_idx])
    s = first_score + second_score
    return (
        0.5 * s,
        (dst_x[first_idx] * first_score + dst_x[second_idx] * second_score) / s,
        (dst_y[first_idx] * first_score + dst_y[second_idx] * second_score) / s,
        (dst_scale[first_idx] * first_score
         + dst_scale[second_idx] * second_score) / s,
    )


def _build_by_source(limbs):
    by_source = {}
    for limb_idx, (s, d) in enumerate(limbs):
        by_source.setdefault(int(s), {})[int(d)] = (limb_idx, True)
        by_source.setdefault(int(d), {})[int(s)] = (limb_idx, False)
    return by_source


def get_connection(ann, src_idx, dst_idx, forward_list, backward_list,
                   by_source, reverse_match=True):
    """(reference: processor.py:312-336)"""
    limb_idx, forward_flag = by_source[src_idx][dst_idx]
    if forward_flag:
        fcons, bcons = forward_list[limb_idx], backward_list[limb_idx]
    else:
        fcons, bcons = backward_list[limb_idx], forward_list[limb_idx]
    c, x, y, scale = ann[src_idx]
    fc, fx, fy, fscale = find_connection(fcons, x, y, scale)
    if fc == 0.0:
        return 0.0, 0.0, 0.0, 0.0
    merge_score = np.sqrt(fc * c)
    if reverse_match:
        rc, rx, ry, _ = find_connection(bcons, fx, fy, fscale)
        if rc == 0.0:
            return 0.0, 0.0, 0.0, 0.0
        if abs(x - rx) + abs(y - ry) > scale:
            return 0.0, 0.0, 0.0, 0.0
    return merge_score, fx, fy, fscale


def grow(ann, forward_list, backward_list, by_source, n_pos,
         reverse_match=True):
    """(reference: processor.py:338-393)"""
    frontier = []
    in_frontier = set()

    def add_frontier(src_idx):
        for dst_idx in by_source.get(src_idx, {}):
            if ann[dst_idx, 0] > 0:
                continue
            if (src_idx, dst_idx) in in_frontier:
                continue
            heapq.heappush(
                frontier, (-np.sqrt(ann[src_idx, 0]), src_idx, dst_idx)
            )
            in_frontier.add((src_idx, dst_idx))

    def get_frontier():
        while frontier:
            _, src_idx, dst_idx = heapq.heappop(frontier)
            if ann[dst_idx, 0] > 0.0:
                continue
            fc, fx, fy, fscale = get_connection(
                ann, src_idx, dst_idx, forward_list, backward_list,
                by_source, reverse_match,
            )
            if fc == 0.0:
                continue
            return fc, fx, fy, fscale, src_idx, dst_idx
        return None

    for pos_idx in range(n_pos):
        if ann[pos_idx, 0] > 0.0:
            add_frontier(pos_idx)
    while True:
        found = get_frontier()
        if found is None:
            break
        score, x, y, scale, _, dst_idx = found
        if ann[dst_idx, 0] > 0.0:
            continue
        ann[dst_idx] = (score, x, y, scale)
        add_frontier(dst_idx)
    return ann


def kpt_nms(annotations, n_pos):
    """(reference: processor.py:246-259)"""
    max_x = int(max(np.max(ann[:, 1]) for ann in annotations) + 1)
    max_y = int(max(np.max(ann[:, 2]) for ann in annotations) + 1)
    occupied = np.zeros((n_pos, max_y, max_x))
    annotations = sorted(annotations, key=lambda ann: -np.sum(ann[:, 0]))
    for ann in annotations:
        for pos_idx in range(n_pos):
            _, x, y, scale = ann[pos_idx]
            if check_occupy(occupied, pos_idx, x, y, reduction=2):
                ann[pos_idx, 0] = 0
            else:
                put_occupy(occupied, pos_idx, x, y, scale, reduction=2,
                           min_scale=4)
    return sorted(annotations, key=lambda ann: -np.sum(ann[:, 0]))


def reference_pifpaf_decode(maps, limbs, stride=8, reverse_match=True):
    """Full process_one transcription on RESTORED maps.

    maps: dict with pif_conf [P,H,W], pif_vec [P,2,H,W] (px), pif_scale
    [P,H,W] (px), paf_conf [L,H,W], paf_{src,dst}_vec [L,2,H,W] (px),
    paf_{src,dst}_scale [L,H,W] (px).
    Returns list of humans: each a dict part_idx -> (score, x, y, scale).
    """
    pif_conf, pif_vec, pif_scale = (
        maps["pif_conf"], maps["pif_vec"], maps["pif_scale"]
    )
    paf_conf = maps["paf_conf"]
    paf_src_vec, paf_dst_vec = maps["paf_src_vec"], maps["paf_dst_vec"]
    paf_src_scale, paf_dst_scale = (
        maps["paf_src_scale"], maps["paf_dst_scale"]
    )
    n_pos = pif_conf.shape[0]
    n_limbs = paf_conf.shape[0]
    by_source = _build_by_source(limbs)

    hr = get_hr_conf(pif_conf, pif_vec, pif_scale, stride=stride)

    seeds = []
    for pos_idx in range(n_pos):
        m = pif_conf[pos_idx] > THRESH_PIF
        cs = pif_conf[pos_idx, m]
        xs = pif_vec[pos_idx, 0, m]
        ys = pif_vec[pos_idx, 1, m]
        scales = pif_scale[pos_idx, m]
        hr_cs = field_to_scalar(xs, ys, hr[pos_idx])
        ref_cs = 0.9 * hr_cs + 0.1 * cs
        keep = ref_cs > THRESH_REF_PIF
        for ref_c, x, y, scale in zip(ref_cs[keep], xs[keep], ys[keep],
                                      scales[keep]):
            seeds.append((ref_c, pos_idx, x, y, scale))
    seeds = sorted(seeds, reverse=True)

    forward_list, backward_list = [], []
    for limb_idx in range(n_limbs):
        src_idx, dst_idx = int(limbs[limb_idx][0]), int(limbs[limb_idx][1])
        m = paf_conf[limb_idx] > THRESH_PAF
        score = paf_conf[limb_idx, m]
        src_x = paf_src_vec[limb_idx, 0, m]
        src_y = paf_src_vec[limb_idx, 1, m]
        dst_x = paf_dst_vec[limb_idx, 0, m]
        dst_y = paf_dst_vec[limb_idx, 1, m]
        src_s = paf_src_scale[limb_idx, m]
        dst_s = paf_dst_scale[limb_idx, m]
        cif_b = field_to_scalar(src_x, src_y, hr[src_idx])
        score_b = score * (CIF_FLOOR + (1 - CIF_FLOOR) * cif_b)
        mb = score_b > THRESH_REF_PAF
        backward_list.append([score_b[mb], dst_x[mb], dst_y[mb], dst_s[mb],
                              src_x[mb], src_y[mb], src_s[mb]])
        cif_f = field_to_scalar(dst_x, dst_y, hr[dst_idx])
        score_f = score * (CIF_FLOOR + (1 - CIF_FLOOR) * cif_f)
        mf = score_f > THRESH_REF_PAF
        forward_list.append([score_f[mf], src_x[mf], src_y[mf], src_s[mf],
                             dst_x[mf], dst_y[mf], dst_s[mf]])

    occupied = np.zeros((n_pos, int(hr.shape[1] / REDUCTION),
                         int(hr.shape[2] / REDUCTION)))
    annotations = []
    for c, pos_idx, x, y, scale in seeds:
        if check_occupy(occupied, pos_idx, x, y):
            continue
        ann = np.zeros((n_pos, 4))
        ann[:, 0] = -1.0
        ann[pos_idx] = (c, x, y, scale)
        ann = grow(ann, forward_list, backward_list, by_source, n_pos,
                   reverse_match)
        annotations.append(ann)
        for k in range(n_pos):
            occupied = put_occupy(occupied, k, ann[k, 1], ann[k, 2],
                                  ann[k, 3])
    if annotations:
        annotations = kpt_nms(annotations, n_pos)

    humans = []
    for ann in annotations:
        parts = {
            k: tuple(ann[k]) for k in range(n_pos) if ann[k, 0] > 0.0
        }
        if len(parts) < PART_NUM_THRESH:
            continue
        if np.mean([v[0] for v in parts.values()]) < SCORE_THRESH:
            continue
        humans.append(parts)
    return humans
