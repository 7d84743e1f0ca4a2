"""PoseProposal: model shapes, loss, target<->decode round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu.data.targets import ppn_targets
from hyperpose_tpu.models.pose_proposal import PoseProposal, pose_proposal_loss
from hyperpose_tpu.ops.ppn_decode import PpnDecoderConfig, ppn_decode_batch
from hyperpose_tpu.utils.topology import PPN_LIMBS, PPN_TOPOLOGY, PpnCocoPart

IN_HW = (96, 96)
OUT_HW = (3, 3)


def test_model_shapes():
    model = PoseProposal(hin=96, win=96)
    x = jnp.zeros((1, 96, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["c"].shape == (1, 3, 3, 18)
    assert out["e"].shape == (1, 17, 9, 9, 3, 3)
    # loss runs against its own targets
    target = {k: np.asarray(v) for k, v in out.items()}
    target["e_mask"] = np.ones_like(target["e"])
    loss, parts = pose_proposal_loss(model, out, target)
    assert np.isfinite(float(loss))
    assert set(parts) == {"loss_rsp", "loss_iou", "loss_coor", "loss_size",
                          "loss_limb"}


def make_people(in_hw=(384, 384)):
    """Two synthetic people with all 18 parts placed in distinct cells."""
    rng = np.random.default_rng(0)
    people = []
    for cx, cy in [(120, 140), (280, 230)]:
        kpts = np.zeros((18, 2), np.float32)
        for k in range(18):
            kpts[k] = (
                cx + rng.uniform(-60, 60), cy + rng.uniform(-90, 90)
            )
        people.append(kpts)
    kpts = np.stack(people)[None]  # [1, 2, 18, 2]
    valid = np.ones((1, 2, 18), bool)
    bbxs = np.array([[[60, 50, 130, 190], [220, 140, 130, 190]]], np.float32)
    return kpts, valid, bbxs


def test_targets_shapes_and_cells():
    kpts, valid, bbxs = make_people()
    t = ppn_targets(kpts, valid, bbxs, PPN_LIMBS, (384, 384), (12, 12))
    assert t["c"].shape == (1, 12, 12, 18)
    assert t["e"].shape == (1, 17, 9, 9, 12, 12)
    c = np.asarray(t["c"])
    # each person's nose occupies its cell
    for m in range(2):
        x, y = kpts[0, m, 0]
        assert c[0, int(y // 32), int(x // 32), 0] == 1.0
    # edge tensor has some positive entries and mask covers them
    assert np.asarray(t["e"]).sum() > 0
    assert (np.asarray(t["e_mask"]) >= np.asarray(t["e"])).all()


def test_target_decode_roundtrip():
    """Perfect targets fed as predictions decode back to the people."""
    kpts, valid, bbxs = make_people()
    in_hw, out_hw = (384, 384), (12, 12)
    t = ppn_targets(kpts, valid, bbxs, PPN_LIMBS, in_hw, out_hw)

    model = PoseProposal(hin=384, win=384)
    rx, ry, rw, rh = model.restore_coor(
        t["x"], t["y"], t["w"], t["h"], *out_hw
    )
    predict = {
        "c": t["c"], "i": t["c"], "x": rx, "y": ry, "w": rw, "h": rh,
        "e": t["e"],
    }
    out = ppn_decode_batch(
        predict, PpnDecoderConfig(), 9, 9, in_hw, PPN_TOPOLOGY
    )
    valid_h = np.asarray(out.valid[0])
    assert valid_h.sum() == 2, f"expected 2 humans, got {valid_h.sum()}"
    coords = np.asarray(out.coords[0])
    pvalid = np.asarray(out.part_valid[0])
    # match decoded humans to gt by nose x
    for m in range(2):
        gx, gy = kpts[0, m, 0]
        best = min(
            np.nonzero(valid_h)[0],
            key=lambda h: abs(coords[h, 0, 0] * 384 - gx),
        )
        n_ok = 0
        for p in range(18):
            if pvalid[best, p]:
                px_, py_ = coords[best, p] * 384
                # cell-center quantization: within one 32px cell
                if abs(px_ - kpts[0, m, p, 0]) <= 32 and \
                   abs(py_ - kpts[0, m, p, 1]) <= 32:
                    n_ok += 1
        assert n_ok >= 15, f"person {m}: only {n_ok}/18 parts close"


def test_decode_empty():
    b, hout, wout = 1, 12, 12
    predict = {
        "c": np.zeros((b, hout, wout, 18), np.float32),
        "i": np.zeros((b, hout, wout, 18), np.float32),
        "x": np.zeros((b, hout, wout, 18), np.float32),
        "y": np.zeros((b, hout, wout, 18), np.float32),
        "w": np.zeros((b, hout, wout, 18), np.float32),
        "h": np.zeros((b, hout, wout, 18), np.float32),
        "e": np.zeros((b, 17, 9, 9, hout, wout), np.float32),
    }
    out = ppn_decode_batch(predict, PpnDecoderConfig(), 9, 9, (384, 384),
                           PPN_TOPOLOGY)
    assert np.asarray(out.valid).sum() == 0


def sparse_random_predict(seed, hout=12, wout=12, n_pos=18, n_limbs=17,
                          hnei=9, wnei=9, n_seeds=6):
    """Sparse random PPN maps: a few positive cells per part, random edge
    activations around them (keeps active cells << top-K so the fixed-K
    device decoder and the unbounded golden model see the same proposals)."""
    rng = np.random.default_rng(seed)
    pc = np.zeros((hout, wout, n_pos), np.float32)
    px = np.zeros_like(pc)
    py = np.zeros_like(pc)
    pw = np.zeros_like(pc)
    ph = np.zeros_like(pc)
    pe = np.zeros((n_limbs, hnei, wnei, hout, wout), np.float32)
    for p in range(n_pos):
        for _ in range(rng.integers(1, n_seeds)):
            cy, cx = rng.integers(0, hout), rng.integers(0, wout)
            pc[cy, cx, p] = rng.uniform(0.25, 1.0)
            px[cy, cx, p] = (cx + rng.uniform()) * 32
            py[cy, cx, p] = (cy + rng.uniform()) * 32
            pw[cy, cx, p] = rng.uniform(20, 60)
            ph[cy, cx, p] = rng.uniform(20, 60)
    for li in range(n_limbs):
        for _ in range(rng.integers(2, 8)):
            sy, sx = rng.integers(0, hout), rng.integers(0, wout)
            dy, dx = rng.integers(0, hnei), rng.integers(0, wnei)
            pe[li, dy, dx, sy, sx] = rng.uniform(0.25, 1.0)
    return {"c": pc, "x": px, "y": py, "w": pw, "h": ph, "e": pe}


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_device_decoder_matches_ppn_golden(seed):
    """Vectorized fixed-shape decoder == sequential reference transcription
    (reference: pose_proposal/processor.py:65-204)."""
    from golden_ppn import golden_decode

    pred = sparse_random_predict(seed)
    in_hw = (384, 384)
    limbs = np.asarray(PPN_LIMBS)
    golden = golden_decode(
        pred["c"], pred["x"], pred["y"], pred["w"], pred["h"], pred["e"],
        limbs,
    )

    batched = {k: v[None] for k, v in pred.items()}
    batched["i"] = batched["c"]
    out = ppn_decode_batch(
        batched, PpnDecoderConfig(), 9, 9, in_hw, PPN_TOPOLOGY
    )
    valid = np.asarray(out.valid[0])
    coords = np.asarray(out.coords[0])
    pvalid = np.asarray(out.part_valid[0])
    pscore = np.asarray(out.part_scores[0])

    device_humans = []
    for h in np.nonzero(valid)[0]:
        parts = {}
        for p in np.nonzero(pvalid[h])[0]:
            parts[int(p)] = (
                float(coords[h, p, 0] * in_hw[1]),
                float(coords[h, p, 1] * in_hw[0]),
                float(pscore[h, p]),
            )
        device_humans.append(parts)

    assert len(device_humans) == len(golden), (
        f"human count {len(device_humans)} != golden {len(golden)}"
    )

    def key(h):
        return sorted(h.keys())

    for gh in golden:
        best = min(
            device_humans,
            key=lambda dh: sum(
                abs(dh.get(p, (1e9, 1e9, 0))[0] - gh[p][0]) for p in gh
            ),
        )
        assert key(best) == key(gh), (
            f"part sets differ: {key(best)} vs {key(gh)}"
        )
        for p, (gx, gy, gs) in gh.items():
            dx_, dy_, ds_ = best[p]
            assert abs(dx_ - gx) < 1e-3 and abs(dy_ - gy) < 1e-3
            assert abs(ds_ - gs) < 1e-4
