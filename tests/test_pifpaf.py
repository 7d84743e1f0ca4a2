"""PifPaf: model shapes, losses, synthetic-field decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu.models.pifpaf import (
    Pifpaf, bce_loss, laplace_loss, pifpaf_loss, pixel_shuffle_nhwc,
    scale_loss,
)
from hyperpose_tpu.ops.pifpaf_decode import (
    PifPafDecoderConfig, pifpaf_decode_batch,
)
from hyperpose_tpu.utils.topology import PIFPAF_BONES


def test_pixel_shuffle():
    x = np.arange(1 * 2 * 2 * 8, dtype=np.float32).reshape(1, 2, 2, 8)
    y = pixel_shuffle_nhwc(jnp.asarray(x), 2)
    assert y.shape == (1, 4, 4, 2)


def test_model_shapes():
    model = Pifpaf(hin=64, win=64)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # stride 16 backbone + 2x pixel shuffle -> stride 8 maps
    assert out["pif_conf"].shape == (1, 8, 8, 17)
    assert out["pif_vec"].shape == (1, 8, 8, 17, 2)
    assert out["paf_conf"].shape == (1, 8, 8, 19)
    assert out["paf_src_vec"].shape == (1, 8, 8, 19, 2)


def test_losses_nan_masking():
    rng = np.random.default_rng(0)
    pd = rng.normal(size=(2, 8, 8, 17)).astype(np.float32)
    gt = rng.uniform(size=(2, 8, 8, 17)).astype(np.float32)
    gt[0, :4] = np.nan
    v = float(bce_loss(jnp.asarray(pd), jnp.asarray(gt)))
    assert np.isfinite(v) and v > 0
    pdv = rng.normal(size=(2, 8, 8, 17, 2)).astype(np.float32)
    gtv = rng.normal(size=(2, 8, 8, 17, 2)).astype(np.float32)
    gtv[1, 2:6] = np.nan
    logb = rng.normal(size=(2, 8, 8, 17)).astype(np.float32)
    bmin = np.full((2, 8, 8, 17), 0.0125, np.float32)
    v = float(laplace_loss(jnp.asarray(pdv), jnp.asarray(logb),
                           jnp.asarray(gtv), jnp.asarray(bmin)))
    assert np.isfinite(v)
    gts = rng.uniform(1, 5, size=(2, 8, 8, 17)).astype(np.float32)
    gts[0, 0] = np.nan
    v = float(scale_loss(jnp.asarray(pd), jnp.asarray(gts)))
    assert np.isfinite(v) and v > 0


def inv_softplus(y):
    return np.log(np.expm1(np.maximum(y, 1e-4)))


def synth_fields(people, h=46, w=54, stride=8):
    """Build raw model-output fields for the given people
    (dict part->(x,y) in input px)."""
    p, l = 17, 19
    pif_conf = np.full((h, w, p), -10.0, np.float32)
    pif_vec = np.zeros((h, w, p, 2), np.float32)
    pif_logb = np.zeros((h, w, p), np.float32)
    pif_scale = np.full((h, w, p), inv_softplus(2.0), np.float32)
    paf_conf = np.full((h, w, l), -10.0, np.float32)
    paf_src = np.zeros((h, w, l, 2), np.float32)
    paf_dst = np.zeros((h, w, l, 2), np.float32)
    paf_sb = np.zeros((h, w, l), np.float32)
    paf_db = np.zeros((h, w, l), np.float32)
    paf_ss = np.full((h, w, l), inv_softplus(2.0), np.float32)
    paf_ds = np.full((h, w, l), inv_softplus(2.0), np.float32)

    for person in people:
        for k, (x, y) in person.items():
            gx, gy = x / stride, y / stride
            for oy in range(-1, 2):
                for ox in range(-1, 2):
                    cy, cx = int(gy) + oy, int(gx) + ox
                    if 0 <= cy < h and 0 <= cx < w:
                        pif_conf[cy, cx, k] = 8.0
                        pif_vec[cy, cx, k] = (gx - cx, gy - cy)
        for li, (a, b) in enumerate(PIFPAF_BONES):
            a, b = int(a), int(b)
            if a not in person or b not in person:
                continue
            ax, ay = np.array(person[a]) / stride
            bx, by = np.array(person[b]) / stride
            for t in np.linspace(0.2, 0.8, 8):
                cx = int(round(ax + t * (bx - ax)))
                cy = int(round(ay + t * (by - ay)))
                if 0 <= cy < h and 0 <= cx < w:
                    paf_conf[cy, cx, li] = 8.0
                    paf_src[cy, cx, li] = (ax - cx, ay - cy)
                    paf_dst[cy, cx, li] = (bx - cx, by - cy)
    return {
        "pif_conf": pif_conf[None], "pif_vec": pif_vec[None],
        "pif_bmin": pif_logb[None], "pif_scale": pif_scale[None],
        "paf_conf": paf_conf[None], "paf_src_vec": paf_src[None],
        "paf_dst_vec": paf_dst[None], "paf_src_bmin": paf_sb[None],
        "paf_dst_bmin": paf_db[None], "paf_src_scale": paf_ss[None],
        "paf_dst_scale": paf_ds[None],
    }


TWO_PEOPLE = [
    {i: (80 + 10 * (i % 5), 60 + 18 * (i // 3)) for i in range(17)},
    {i: (280 + 10 * (i % 5), 120 + 18 * (i // 3)) for i in range(17)},
]


def test_decode_two_people():
    fields = synth_fields(TWO_PEOPLE)
    out = pifpaf_decode_batch(
        fields, PifPafDecoderConfig(), 8, (368, 432)
    )
    valid = np.asarray(out.valid[0])
    assert valid.sum() == 2, f"expected 2 humans, got {valid.sum()}"
    coords = np.asarray(out.coords[0])
    pvalid = np.asarray(out.part_valid[0])
    for gt in TWO_PEOPLE:
        gx, gy = gt[0]
        best = min(
            np.nonzero(valid)[0],
            key=lambda hid: abs(coords[hid, 0, 0] * 432 - gx),
        )
        n_ok = 0
        for k, (x, y) in gt.items():
            if pvalid[best, k]:
                px_, py_ = coords[best, k] * (432, 368)
                if abs(px_ - x) < 10 and abs(py_ - y) < 10:
                    n_ok += 1
        assert n_ok >= 13, f"only {n_ok}/17 keypoints matched"


def test_decode_empty():
    fields = synth_fields([])
    out = pifpaf_decode_batch(fields, PifPafDecoderConfig(), 8, (368, 432))
    assert np.asarray(out.valid).sum() == 0


def test_total_loss_finite():
    fields = synth_fields(TWO_PEOPLE)
    target = {k: v.copy() for k, v in fields.items()}
    # conf targets are probabilities (0/1), with NaN allowed
    target["pif_conf"] = (target["pif_conf"] > 0).astype(np.float32)
    target["paf_conf"] = (target["paf_conf"] > 0).astype(np.float32)
    total, parts = pifpaf_loss(fields, target)
    assert np.isfinite(float(total))
    assert len(parts) == 8


def test_pifpaf_targets_roundtrip():
    """Device-generated CIF/CAF targets, fed back as perfect predictions,
    decode to the original people."""
    from hyperpose_tpu.data.targets import pifpaf_targets

    in_hw, out_hw = (368, 432), (46, 54)
    people = TWO_PEOPLE
    kpts = np.zeros((1, 2, 17, 2), np.float32)
    valid = np.ones((1, 2, 17), bool)
    for m, person in enumerate(people):
        for k, (x, y) in person.items():
            kpts[0, m, k] = (x, y)
    t = pifpaf_targets(kpts, valid, PIFPAF_BONES, in_hw, out_hw)
    assert t["pif_conf"].shape == (1, 46, 54, 17)
    assert t["paf_src_vec"].shape == (1, 46, 54, 19, 2)
    pc = np.asarray(t["pif_conf"])
    assert np.nansum(pc) > 0

    def to_logit(conf):
        c = np.nan_to_num(np.asarray(conf), nan=0.0)
        return np.where(c > 0.5, 8.0, -10.0).astype(np.float32)

    def raw_vec(v):
        return np.nan_to_num(np.asarray(v), nan=0.0).astype(np.float32)

    def raw_scale(s):
        s = np.nan_to_num(np.asarray(s), nan=1.0)
        return inv_softplus(np.maximum(s, 0.2)).astype(np.float32)

    predict = {
        "pif_conf": to_logit(t["pif_conf"]),
        "pif_vec": raw_vec(t["pif_vec"]),
        "pif_bmin": np.zeros_like(to_logit(t["pif_conf"])),
        "pif_scale": raw_scale(t["pif_scale"]),
        "paf_conf": to_logit(t["paf_conf"]),
        "paf_src_vec": raw_vec(t["paf_src_vec"]),
        "paf_dst_vec": raw_vec(t["paf_dst_vec"]),
        "paf_src_bmin": np.zeros_like(to_logit(t["paf_conf"])),
        "paf_dst_bmin": np.zeros_like(to_logit(t["paf_conf"])),
        "paf_src_scale": raw_scale(t["paf_src_scale"]),
        "paf_dst_scale": raw_scale(t["paf_dst_scale"]),
    }
    out = pifpaf_decode_batch(predict, PifPafDecoderConfig(), 8, in_hw)
    n = int(np.asarray(out.valid[0]).sum())
    assert n == 2, f"expected 2 humans from target roundtrip, got {n}"


def numpy_find_connection(mx, my, mscore, mvalid, ox, oy, oscale, x, y,
                          scale):
    """Direct transcription of find_connection (reference:
    processor.py:262-310) for cross-checking the vectorized version."""
    sigma_f = 2.0 * scale
    sigma_g = 0.25 * scale**2
    first_i, first_s, second_i, second_s = -1, 0.0, -1, 0.0
    for i in range(len(mx)):
        if not mvalid[i]:
            continue
        if x < mx[i] - sigma_f or x > mx[i] + sigma_f:
            continue
        if y < my[i] - sigma_f or y > my[i] + sigma_f:
            continue
        d = (mx[i] - x) ** 2 + (my[i] - y) ** 2
        w = np.exp(-0.5 * d / sigma_g) * mscore[i]
        if w > first_s:
            second_i, second_s = first_i, first_s
            first_i, first_s = i, w
        elif w > second_s:
            second_i, second_s = i, w
    if first_i == -1 or first_s == 0.0:
        return 0.0, 0.0, 0.0, 0.0
    if second_i == -1 or second_s < 0.01 or second_s < 0.5 * first_s:
        return 0.5 * first_s, ox[first_i], oy[first_i], oscale[first_i]
    d12 = (ox[first_i] - ox[second_i]) ** 2 + (oy[first_i] - oy[second_i]) ** 2
    if d12 > oscale[first_i] ** 2 / 4.0:
        return 0.5 * first_s, ox[first_i], oy[first_i], oscale[first_i]
    tot = first_s + second_s
    return (
        0.5 * tot,
        (ox[first_i] * first_s + ox[second_i] * second_s) / tot,
        (oy[first_i] * first_s + oy[second_i] * second_s) / tot,
        (oscale[first_i] * first_s + oscale[second_i] * second_s) / tot,
    )


def test_find_connection_matches_reference_semantics():
    from hyperpose_tpu.ops.pifpaf_decode import _find_connection

    rng = np.random.default_rng(0)
    mismatches = 0
    for trial in range(50):
        k = 24
        mx = rng.uniform(0, 100, k).astype(np.float32)
        my = rng.uniform(0, 100, k).astype(np.float32)
        mscore = rng.uniform(0, 1, k).astype(np.float32)
        mvalid = rng.random(k) > 0.3
        ox = rng.uniform(0, 100, k).astype(np.float32)
        oy = rng.uniform(0, 100, k).astype(np.float32)
        osc = rng.uniform(1, 10, k).astype(np.float32)
        x, y = rng.uniform(20, 80, 2)
        scale = rng.uniform(2, 12)

        want = numpy_find_connection(mx, my, mscore, mvalid, ox, oy, osc,
                                     x, y, scale)
        got = _find_connection(
            jnp.asarray(mx), jnp.asarray(my), jnp.asarray(mscore),
            jnp.asarray(mvalid), jnp.asarray(ox), jnp.asarray(oy),
            jnp.asarray(osc), jnp.float32(x), jnp.float32(y),
            jnp.float32(scale),
        )
        got = tuple(float(v) for v in got)
        if not np.allclose(got, want, atol=1e-4):
            mismatches += 1
    assert mismatches == 0, f"{mismatches}/50 trials diverged"


def test_grow_pallas_matches_xla():
    """The fused pallas growth kernel (interpret mode on CPU) is
    bit-equivalent to the XLA fallback growth."""
    fields = synth_fields(TWO_PEOPLE)
    out_x = pifpaf_decode_batch(
        fields, PifPafDecoderConfig(grow_backend="xla"), 8, (368, 432)
    )
    out_p = pifpaf_decode_batch(
        fields, PifPafDecoderConfig(grow_backend="pallas"), 8, (368, 432)
    )
    for name in ("coords", "part_scores", "part_valid", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_x, name)),
            np.asarray(getattr(out_p, name)), atol=1e-5, err_msg=name,
        )


def test_grow_pallas_matches_xla_random():
    """Same equivalence on dense random fields (exercises ties, rejects,
    reverse-match failures)."""
    rng = np.random.default_rng(7)
    h, w = 24, 28
    fields = {
        "pif_conf": rng.normal(size=(2, h, w, 17)).astype(np.float32),
        "pif_vec": rng.normal(size=(2, h, w, 17, 2)).astype(np.float32),
        "pif_bmin": np.zeros((2, h, w, 17), np.float32),
        "pif_scale": rng.normal(size=(2, h, w, 17)).astype(np.float32),
        "paf_conf": rng.normal(size=(2, h, w, 19)).astype(np.float32),
        "paf_src_vec": rng.normal(size=(2, h, w, 19, 2)).astype(np.float32),
        "paf_dst_vec": rng.normal(size=(2, h, w, 19, 2)).astype(np.float32),
        "paf_src_scale": rng.normal(size=(2, h, w, 19)).astype(np.float32),
        "paf_dst_scale": rng.normal(size=(2, h, w, 19)).astype(np.float32),
    }
    out_x = pifpaf_decode_batch(
        fields, PifPafDecoderConfig(grow_backend="xla"), 8, (192, 224)
    )
    out_p = pifpaf_decode_batch(
        fields, PifPafDecoderConfig(grow_backend="pallas"), 8, (192, 224)
    )
    for name in ("coords", "part_scores", "part_valid", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_x, name)),
            np.asarray(getattr(out_p, name)), atol=1e-4, err_msg=name,
        )


def test_bounded_select_matches_topk_set():
    """Below capacity, _bounded_select keeps exactly the above-threshold
    set that a value top-k would (order-free)."""
    from hyperpose_tpu.ops.pifpaf_decode import _bounded_select

    rng = np.random.default_rng(3)
    vals = rng.random((5, 200)).astype(np.float32)
    vals[vals < 0.9] = 0.0                      # ~20 survivors per row
    fields = np.stack([vals, vals * 2.0 + 1.0], axis=-1)
    out = np.asarray(
        _bounded_select(jnp.asarray(vals) > 0.5, jnp.asarray(fields), 32)
    )
    for r in range(5):
        want = sorted(vals[r][vals[r] > 0.5])
        got = sorted(out[r, :, 0][out[r, :, 0] > 0.0])
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # paired field rides along with its key
        nz = out[r, :, 0] > 0
        np.testing.assert_allclose(
            out[r, nz, 1], out[r, nz, 0] * 2.0 + 1.0, rtol=1e-6
        )
        # empty slots zeroed
        assert (out[r, ~nz] == 0).all()


def test_bounded_select_overflow_keeps_first():
    from hyperpose_tpu.ops.pifpaf_decode import _bounded_select

    vals = np.arange(1, 11, dtype=np.float32)[None]       # all pass
    out = np.asarray(
        _bounded_select(jnp.asarray(vals) > 0, jnp.asarray(vals[..., None]), 4)
    )
    np.testing.assert_allclose(out[0, :, 0], [1, 2, 3, 4])


def test_pairwise_rank_matches_stable_argsort():
    from hyperpose_tpu.ops.pifpaf_decode import _pairwise_rank

    rng = np.random.default_rng(7)
    v = rng.integers(0, 5, size=50).astype(np.float32)    # many ties
    rank = np.asarray(_pairwise_rank(jnp.asarray(v)))
    order = np.argsort(-v, kind="stable")
    inv = np.argsort(order, kind="stable")
    np.testing.assert_array_equal(rank, inv)


def test_decode_crowded_rank_nms():
    """Four people exercise the rank-based seed NMS + keypoint NMS path."""
    people = [
        {i: (60 + 90 * j + 8 * (i % 4), 60 + 20 * (i // 4)) for i in range(17)}
        for j in range(4)
    ]
    fields = synth_fields(people)
    out = pifpaf_decode_batch(fields, PifPafDecoderConfig(), 8, (368, 432))
    assert int(np.asarray(out.valid[0]).sum()) == 4
