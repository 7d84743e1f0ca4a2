"""TPU-native Part-Affinity-Field decoder.

This is a from-scratch, fixed-shape redesign of the reference's CPU PAF parser
(reference: src/paf.cpp:300-375 `paf::process`, src/post_process.hpp:134-205
`peak_finder_t`, hyperpose/Model/openpose/processor.py:68-235). Instead of
dynamic peak lists, std::sort and sequential human merging on the host, every
stage is expressed as a bounded-shape XLA computation so the whole decode runs
on-device, batched, inside one `jit`:

  1. Gaussian smooth + 3x3 same-max-pool peak NMS at FEATURE resolution,
     with quadratic sub-pixel refinement -> top-K peaks per part channel.
     The reference upsamples maps 4x and takes integer argmax peaks
     (paf.cpp:319-345); sub-pixel refinement reaches finer localization at
     1/16 the bandwidth, which matters on TPU where the decode is fused
     behind the conv net in one XLA program.
  2. line-integral scoring of all KxK peak pairs per limb, 10 samples,
     gathered from the feature-res PAF planes by a fused Pallas kernel on
     TPU (ops/pallas/line_gather.py; one-hot MXU contraction in VMEM) with
     a batched one-hot-einsum XLA fallback
                                      (replaces get_connection_candidates, paf.cpp:95-137)
  3. greedy connection NMS as a fori_loop over the top-T sorted candidates,
     vectorized over (batch, limb)    (replaces get_connections, paf.cpp:234-272)
  4. skeleton assembly as connected-component label propagation over the
     accepted connection graph        (replaces get_humans' sequential
                                       merge-by-membership, paf.cpp:146-232)
  5. per-component part selection, scoring and filtering
     (n_parts >= 4 and score/n_parts >= 0.4, paf.cpp:57-59,226-230)

Known, intentional divergences from the reference (all rare tie cases):
  * two part-sharing skeletons connected by an accepted edge are merged here
    (connected components) whereas paf.cpp:183-187 refuses the merge; and a
    part slot is resolved by max peak score instead of first-write order.
  * peaks are capped at the top `max_peaks` per part by smoothed score.
  * PAF line samples are rounded to feature-res pixels instead of 4x-res
    pixels (the field is locally smooth, mAP-neutral).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .image import gaussian_smooth_nhwc, same_max_pool_3x3_nhwc
from ..utils.topology import COCO_TOPOLOGY, Topology

_NEG = -1e30  # sentinel for "invalid" in score arrays (avoid inf arithmetic)


@dataclasses.dataclass(frozen=True)
class PafDecoderConfig:
    """Static decode parameters (all shape-affecting fields are Python ints)."""

    n_parts: int = 18
    n_limbs: int = 19
    max_peaks: int = 16        # K: peaks kept per part channel
    max_candidates: int = 64   # T: sorted connection candidates tried per limb
    max_humans: int = 32
    upsample: int = 4          # virtual upsample for length-penalty parity
                               # (reference: paf.cpp:319-320 decodes at 4x)
    n_samples: int = 10        # STEP_PAF, paf.cpp:60
    smooth_ksize: int = 5      # ksize 17 @4x (paf.cpp:346) ~ 5 @1x
    smooth_sigma: float = 0.75  # sigma 3 @4x (post_process.hpp:58) ~ 0.75 @1x
    conf_thresh: float = 0.05  # paf.hpp:27
    paf_thresh: float = 0.05
    crit1_thresh: int = 8      # THRESH_VECTOR_CNT1, paf.cpp:55 (python eval uses 6)
    min_parts: int = 4         # THRESH_PART_CNT
    min_human_score: float = 0.4  # THRESH_HUMAN_SCORE (python eval uses 0.3)
    label_prop_iters: int = 18  # >= worst-case component diameter
                                # (n_parts chain; verified against the
                                # sequential golden model in tests)
    use_pallas_peaks: bool = False  # legacy smooth+NMS-only kernel (slower
                               # than the XLA front end on v5e — it round-
                               # trips full maps through HBM; ablation only)
    # Peak front-end backend. "auto" = XLA everywhere: the fully fused
    # pallas kernel (ops/pallas/peak_kernel.fused_peak_topk — smooth+NMS+
    # top-K+sub-pixel in one VMEM pass) measured 13.1 ms/batch-128 on v5e
    # vs 2.3 ms for the XLA front end: its K unrolled masked-reduction
    # rounds are VPU-bound, while XLA's argmax rounds stream from HBM at
    # full bandwidth. Kept behind "pallas" for ablation.
    peaks_backend: str = "auto"
    gather_bf16: bool = True   # line-integral gather in bf16: selection
                               # stays exact (one-hots are 0/1), sampled
                               # PAF values round to bf16 (<0.4%; the net
                               # computed them in bf16 anyway).
    # Line-integral sample gather backend: "auto" = fused pallas kernel on
    # TPU (ops/pallas/line_gather.py; the one-hot contraction runs in VMEM
    # instead of materializing [L,2,M,W] in HBM — measured 6.4 ms/batch-128
    # for the XLA lowering on v5e), XLA elsewhere; "pallas"/"xla" force one.
    gather_backend: str = "auto"

    def replace(self, **kw) -> "PafDecoderConfig":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodedSkeletons:
    """Fixed-shape decode output (leading batch dim on every field)."""

    coords: jax.Array       # [B, MAX_H, P, 2] normalized (x, y) in [0, 1]
    part_scores: jax.Array  # [B, MAX_H, P]
    part_valid: jax.Array   # [B, MAX_H, P] bool
    scores: jax.Array       # [B, MAX_H]
    valid: jax.Array        # [B, MAX_H] bool


def find_peaks(
    conf: jax.Array, cfg: PafDecoderConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-K peak NMS with sub-pixel refinement over [B, H, W, P] maps.

    A peak is a pixel of the smoothed map that survives 3x3 same-max-pool NMS
    and exceeds conf_thresh; its reported score is taken from the *unsmoothed*
    map (reference: post_process.hpp:176-187). Sub-pixel offsets come from a
    1-D quadratic fit per axis on the smoothed map.

    Returns (peak_xy [B,P,K,2] float32, peak_score [B,P,K], peak_valid [B,P,K]).
    """
    b, h, w, p = conf.shape
    k = min(cfg.max_peaks, h * w)
    if cfg.peaks_backend == "pallas":
        from .pallas.peak_kernel import fused_peak_topk

        xy, raw, sval = fused_peak_topk(
            conf, k, cfg.smooth_ksize, cfg.smooth_sigma, cfg.conf_thresh,
            interpret=jax.default_backend() != "tpu",
        )
        valid = sval > _NEG * 0.5
        return xy, jnp.where(valid, raw, 0.0), valid
    if cfg.use_pallas_peaks:
        from .pallas.peak_kernel import fused_peak_candidates

        ranked_pf, smoothed_pf = fused_peak_candidates(
            conf, cfg.smooth_ksize, cfg.smooth_sigma, cfg.conf_thresh, _NEG
        )
        flat = ranked_pf.reshape(b, p, h * w)
        smoothed = smoothed_pf.transpose(0, 2, 3, 1)
    else:
        smoothed = gaussian_smooth_nhwc(
            conf, cfg.smooth_ksize, cfg.smooth_sigma
        )
        pooled = same_max_pool_3x3_nhwc(smoothed)
        is_peak = (smoothed >= pooled) & (smoothed > cfg.conf_thresh)
        # Plateau tie-break: exact ties (symmetric blobs) would emit every
        # tied pixel under `==`-style NMS. Two adjacent survivors necessarily
        # hold equal values, so keep only the candidate whose pixel index is
        # the max among candidates in its 3x3 window (integer-space rule).
        pix = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w, 1)
        cand_idx = jnp.where(is_peak, pix, -1)
        pooled_idx = lax.reduce_window(
            jnp.broadcast_to(cand_idx, smoothed.shape),
            jnp.int32(-1), lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME",
        )
        is_peak = is_peak & (pix == pooled_idx)
        ranked = jnp.where(is_peak, smoothed, _NEG)       # [B,H,W,P]
        flat = ranked.transpose(0, 3, 1, 2).reshape(b, p, h * w)
    # Top-K as K rounds of (argmax, mask): NMS survivors are sparse, and on
    # TPU K bandwidth-bound passes beat lax.top_k's full sort by ~1.4x at
    # the default K=16 (measured on v5e). Ties resolve to the lowest flat
    # index, identical to lax.top_k's stable order.
    iota_hw = jnp.arange(h * w, dtype=jnp.int32)
    cur = flat
    tv, ti = [], []
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)    # [B,P]
        tv.append(jnp.take_along_axis(cur, i[..., None], axis=-1))
        ti.append(i[..., None])
        cur = jnp.where(iota_hw == i[..., None], 2.0 * _NEG, cur)
    top_vals = jnp.concatenate(tv, axis=-1)               # [B,P,K]
    top_idx = jnp.concatenate(ti, axis=-1)
    valid = top_vals > _NEG * 0.5
    ys = top_idx // w
    xs = top_idx % w

    # Gather raw scores and the 4 axis-neighbors of the smoothed map for the
    # quadratic sub-pixel fit: dx = 0.5*(f+ - f-)/(f+ - 2f0 + f-), clipped.
    sm_flat = smoothed.transpose(0, 3, 1, 2).reshape(b, p, h * w)
    raw_flat = conf.transpose(0, 3, 1, 2).reshape(b, p, h * w)

    def g(flat_map, idx):
        return jnp.take_along_axis(flat_map, idx, axis=-1)

    f0 = g(sm_flat, top_idx)
    fxp = g(sm_flat, jnp.clip(top_idx + 1, 0, h * w - 1))
    fxm = g(sm_flat, jnp.clip(top_idx - 1, 0, h * w - 1))
    fyp = g(sm_flat, jnp.clip(top_idx + w, 0, h * w - 1))
    fym = g(sm_flat, jnp.clip(top_idx - w, 0, h * w - 1))

    def subpix(fp, fm, f0):
        denom = fp - 2.0 * f0 + fm
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (fm - fp) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dx = subpix(fxp, fxm, f0)
    dy = subpix(fyp, fym, f0)
    scores = g(raw_flat, top_idx)
    xy = jnp.stack(
        [xs.astype(jnp.float32) + dx, ys.astype(jnp.float32) + dy], axis=-1
    )
    return xy, jnp.where(valid, scores, 0.0), valid


def _use_pallas_gather(cfg: PafDecoderConfig) -> bool:
    if cfg.gather_backend == "pallas":
        return True
    if cfg.gather_backend == "xla":
        return False
    return jax.default_backend() == "tpu"


def _limb_pair_scores(
    paf: jax.Array,            # [B, H, W, 2L]
    peak_xy: jax.Array,        # [B, P, K, 2] float
    peak_valid: jax.Array,     # [B, P, K]
    limbs: np.ndarray,         # [L, 2]
    cfg: PafDecoderConfig,
) -> jax.Array:
    """Line-integral score of every (peak_a, peak_b) pair for every limb,
    batched over images.

    Returns cand_score [B, L, K, K] with invalid pairs set to _NEG.
    (reference: src/paf.cpp:66-137)
    """
    b, h, w, _ = paf.shape
    l, s, k = limbs.shape[0], cfg.n_samples, peak_xy.shape[2]
    pa = peak_xy[:, limbs[:, 0]]                   # [B,L,K,2]
    pb = peak_xy[:, limbs[:, 1]]
    va = peak_valid[:, limbs[:, 0]]                # [B,L,K]
    vb = peak_valid[:, limbs[:, 1]]

    diff = pb[:, :, None, :, :] - pa[:, :, :, None, :]   # [B,L,K,K,2]
    norm = jnp.sqrt(jnp.sum(diff * diff, axis=-1))       # [B,L,K,K]
    unit = diff / jnp.maximum(norm, 1e-12)[..., None]

    # Sample positions: round(pa + i/S * diff), i in [0, S)  (paf.cpp:77-91).
    ts = (jnp.arange(s, dtype=jnp.float32) / s).reshape(1, 1, 1, 1, s, 1)
    loc = pa[:, :, :, None, None, :] + ts * diff[:, :, :, :, None, :]
    loc = jnp.floor(loc + 0.5).astype(jnp.int32)   # C++ int(v + 0.5)
    lx = jnp.clip(loc[..., 0], 0, w - 1)
    ly = jnp.clip(loc[..., 1], 0, h - 1)
    m = k * k * s
    rows_y = ly.reshape(b, l, m)                   # [B, L, M]
    cols_x = lx.reshape(b, l, m)
    paf_planes = paf.reshape(b, h, w, l, 2).transpose(0, 3, 4, 1, 2)
    if _use_pallas_gather(cfg):
        # Fused VMEM gather kernel: one MXU one-hot contraction per
        # (image, limb), nothing but planes+indices+results in HBM.
        from .pallas.line_gather import fused_line_gather

        vals = fused_line_gather(
            paf_planes, rows_y, cols_x, bf16=cfg.gather_bf16,
            # Forcing "pallas" off-TPU runs the kernel interpreted (tests).
            interpret=jax.default_backend() != "tpu",
        )                                          # [B, L, 2, M] f32
    else:
        # XLA fallback: the same lookup as one-hot contractions — TPU has
        # no fast scattered gather, but the MXU eats one-hot matmuls; this
        # lowering materializes the [B,L,2,M,W] intermediate in HBM.
        gdt = jnp.bfloat16 if cfg.gather_bf16 else paf.dtype
        planes = paf_planes.astype(gdt)            # [B, L, 2, H, W]
        row_onehot = (
            jnp.arange(h, dtype=jnp.int32) == rows_y[..., None]
        ).astype(gdt)                              # [B, L, M, H]
        rows = jnp.einsum(
            "blmh,blchw->blcmw", row_onehot, planes,
            preferred_element_type=gdt,
        )                                          # [B, L, 2, M, W]
        col_onehot = (
            jnp.arange(w, dtype=jnp.int32) == cols_x[..., None]
        ).astype(gdt)                              # [B, L, M, W]
        vals = jnp.einsum(
            "blcmw,blmw->blcm", rows, col_onehot,
            preferred_element_type=jnp.float32,
        )
    px = vals[:, :, 0].reshape(b, l, k, k, s)
    py = vals[:, :, 1].reshape(b, l, k, k, s)

    dot = unit[..., 0:1] * px + unit[..., 1:2] * py  # [B,L,K,K,S]
    crit1 = jnp.sum(dot > cfg.paf_thresh, axis=-1)
    mean_score = jnp.sum(dot, axis=-1) / s
    # Length penalty: min(0, 0.5*H_feat/norm_up - 1) with norm in virtual
    # upsampled units (paf.cpp:129,352 — height is pre-upsample, peaks are
    # post-upsample).
    norm_up = cfg.upsample * norm
    crit2 = mean_score + jnp.minimum(
        0.0, 0.5 * h / jnp.maximum(norm_up, 1e-12) - 1.0
    )

    ok = (
        (crit1 > cfg.crit1_thresh)
        & (crit2 > 0)
        & (norm > 1e-6)
        & va[:, :, :, None]
        & vb[:, :, None, :]
    )
    return jnp.where(ok, crit2, _NEG)


def _greedy_connections(
    cand_score: jax.Array, cfg: PafDecoderConfig
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Greedy connection NMS per limb over sorted candidates.

    Accept candidates best-first; a candidate is rejected if an accepted
    connection of the same limb already uses its source or destination peak
    (reference: src/paf.cpp:244-272). Runs as a T-step fori_loop whose body is
    vectorized over all limbs at once.

    Returns (src [L,T], dst [L,T], score [L,T], accepted [L,T] bool).
    """
    l, k, _ = cand_score.shape
    t = min(cfg.max_candidates, k * k)
    flat = cand_score.reshape(l, k * k)
    top_vals, top_idx = lax.top_k(flat, t)   # sorted desc per limb
    src = (top_idx // k).astype(jnp.int32)
    dst = (top_idx % k).astype(jnp.int32)
    valid = top_vals > _NEG * 0.5

    # Dense fixpoint instead of a T-step sequential scatter loop: candidate
    # t is accepted iff no earlier ACCEPTED candidate shares its src or dst.
    # Iterating  accepted <- valid & ~any(conflicts & accepted)  finalizes
    # the decision of candidate i by round i (induction over the sorted
    # order), so T rounds reproduce the sequential greedy exactly — but
    # each round is a tiny dense [L, T, T] op instead of scatters. Any
    # fixed point reached from init=valid equals the round-T result (the
    # trajectory is deterministic and stationary once stable), so the loop
    # exits as soon as a round changes nothing — in practice a handful of
    # rounds, not T.
    earlier = (
        jnp.arange(t)[None, :, None] > jnp.arange(t)[None, None, :]
    )                                                   # [1, T(i), T(j<i)]
    conflicts = earlier & (
        (src[:, :, None] == src[:, None, :])
        | (dst[:, :, None] == dst[:, None, :])
    )                                                   # [L, T, T]

    def cond(state):
        i, _, changed = state
        return (i < t) & changed

    def body(state):
        i, accepted, _ = state
        suppressed = jnp.any(conflicts & accepted[:, None, :], axis=-1)
        new = valid & ~suppressed
        return i + 1, new, jnp.any(new != accepted)

    _, accepted, _ = lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True))
    )
    return src, dst, top_vals, accepted


def _assemble(
    src: jax.Array, dst: jax.Array, conn_score: jax.Array, accepted: jax.Array,
    peak_xy: jax.Array, peak_score: jax.Array,
    limbs: np.ndarray, hw: tuple[int, int], cfg: PafDecoderConfig,
):
    """Group accepted connections into skeletons via label propagation.

    Nodes are (part, peak-slot) pairs; accepted connections are edges; each
    connected component is one human. Min-label propagation for a fixed
    iteration count (>= graph diameter) replaces the reference's
    order-dependent sequential merge (src/paf.cpp:146-232) with a fully
    vectorized equivalent.
    """
    p, k = cfg.n_parts, cfg.max_peaks
    n = p * k
    uf = (limbs[:, 0:1] * k + src).reshape(-1)   # [E = L*T]
    vf = (limbs[:, 1:2] * k + dst).reshape(-1)
    af = accepted.reshape(-1)
    sf = jnp.where(af, conn_score.reshape(-1), 0.0)

    # Dense adjacency over the (part, peak-slot) node space: two one-hot
    # outer-product scatters build A once; min-label propagation is then a
    # masked row-min — pure VPU work, no serialized scatters in the loop.
    # The one-hots are 0/1 and the contractions accumulate exact integer
    # counts in f32, so bf16 operands are exact and halve the HBM traffic
    # of the two [E, N]-operand matmuls (the assembly stage's main cost).
    u_oh = jax.nn.one_hot(uf, n, dtype=jnp.bfloat16)     # [E, N]
    v_oh = jax.nn.one_hot(vf, n, dtype=jnp.bfloat16)
    ae = af.astype(jnp.bfloat16)[:, None]
    adj = jnp.einsum(
        "en,em->nm", u_oh * ae, v_oh, preferred_element_type=jnp.float32
    ) > 0
    adj = adj | adj.T
    adj = adj | jnp.eye(n, dtype=jnp.bool_)

    labels0 = jnp.arange(n, dtype=jnp.int32)

    # Min-label propagation is monotone non-increasing, so the first stable
    # round IS the fixpoint: exit early (diameter rounds, typically <= 4)
    # with label_prop_iters as the worst-case cap.
    def prop_cond(state):
        i, _, changed = state
        return (i < cfg.label_prop_iters) & changed

    def prop_body(state):
        i, labels, _ = state
        new = jnp.min(
            jnp.where(adj, labels[None, :], n), axis=1
        ).astype(jnp.int32)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = lax.while_loop(
        prop_cond, prop_body, (jnp.int32(0), labels0, jnp.bool_(True))
    )

    in_edge = jnp.any(adj & ~jnp.eye(n, dtype=jnp.bool_), axis=1)
    root_of = labels  # component id per node

    # Component membership as a dense [N(root), N(node)] mask: every
    # aggregation below becomes a matmul/masked reduction.
    comp_member = (
        (root_of[None, :] == labels0[:, None]) & in_edge[None, :]
    ).astype(jnp.bfloat16)                               # [R, N] 0/1
    edge_root = jnp.einsum(
        "en,rn->er", u_oh, comp_member, preferred_element_type=jnp.float32
    )                                                    # [E, R] 0/1
    conn_sum = jnp.einsum("er,e->r", edge_root, sf)

    part_of_node = jnp.repeat(jnp.arange(p, dtype=jnp.int32), k)
    part_oh = jax.nn.one_hot(part_of_node, p, dtype=jnp.bfloat16)  # [N, P]
    presence = jnp.einsum(
        "rn,np->rp", comp_member, part_oh, preferred_element_type=jnp.float32
    ) > 0
    n_parts_comp = jnp.sum(presence, axis=-1)
    pscore_flat = peak_score.reshape(n)
    # Scores stay f32: comp_member is an exact 0/1 mask in any dtype.
    peak_sum = jnp.einsum(
        "rn,n->r", comp_member.astype(jnp.float32), pscore_flat
    )
    comp_score = peak_sum + conn_sum

    is_root = (labels == labels0) & in_edge
    keep = (
        is_root
        & (n_parts_comp >= cfg.min_parts)
        & (comp_score / jnp.maximum(n_parts_comp, 1) >= cfg.min_human_score)
    )
    rank = jnp.where(keep, comp_score, _NEG)
    top_scores, top_roots = lax.top_k(rank, cfg.max_humans)   # [MAX_H]
    human_valid = top_scores > _NEG * 0.5

    # Resolve each human's part slots: highest-scoring member peak per part.
    member = (root_of[None, :] == top_roots[:, None]) & in_edge[None, :]
    member = member.reshape(cfg.max_humans, p, k)
    member_scores = jnp.where(member, peak_score[None], _NEG)
    best_k = jnp.argmax(member_scores, axis=-1)               # [MAX_H, P]
    part_score = jnp.max(member_scores, axis=-1)
    part_valid = part_score > _NEG * 0.5
    part_score = jnp.where(part_valid, part_score, 0.0)

    xy = peak_xy[jnp.arange(p)[None, :], best_k]              # [MAX_H, P, 2]
    h, w = hw
    # Pixel-center convention: feature pixel i -> normalized (i + 0.5) / size.
    coords = (xy + 0.5) / jnp.array([w, h], jnp.float32)
    coords = jnp.where(part_valid[..., None], coords, 0.0)

    scores = jnp.where(human_valid, top_scores, 0.0)
    part_valid = part_valid & human_valid[:, None]
    return coords, part_score, part_valid, scores, human_valid


@functools.partial(jax.jit, static_argnames=("cfg", "feat_hw", "topology"))
def paf_decode_batch(
    conf: jax.Array,   # [B, H, W, P(+bg)]
    paf: jax.Array,    # [B, H, W, 2L]
    cfg: PafDecoderConfig = PafDecoderConfig(),
    feat_hw: tuple[int, int] | None = None,  # kept for API compat; unused
    topology: Topology = COCO_TOPOLOGY,
) -> DecodedSkeletons:
    """Full batched PAF decode: feature maps -> fixed-shape skeletons.

    conf may include a background channel (channel n_parts); only the first
    n_parts channels are searched for peaks (reference: post_process.hpp:179).
    """
    del feat_hw
    b, h, w, _ = conf.shape
    conf = conf[..., : cfg.n_parts]

    peak_xy, peak_score, peak_valid = find_peaks(conf, cfg)
    # Keep the limb table as numpy: it is embedded as an XLA constant at
    # lowering with no device round-trip (important under remote backends).
    limbs = np.asarray(topology.limbs)

    # Pair scoring runs batched (its gather kernel grids over (image, limb));
    # the per-image greedy NMS + assembly stages are vmapped over it.
    cand = _limb_pair_scores(paf, peak_xy, peak_valid, limbs, cfg)

    def decode_one(cand_i, pxy, pscore):
        src, dst, cscore, accepted = _greedy_connections(cand_i, cfg)
        return _assemble(
            src, dst, cscore, accepted, pxy, pscore, limbs, (h, w), cfg
        )

    coords, part_scores, part_valid, scores, valid = jax.vmap(decode_one)(
        cand, peak_xy, peak_score
    )
    return DecodedSkeletons(coords, part_scores, part_valid, scores, valid)
