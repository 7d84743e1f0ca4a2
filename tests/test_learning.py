"""End-to-end learning convergence: targets -> loss -> training -> decode.

The reference never tests that its training loop actually *learns* (its only
correctness guard is full COCO mAP runs, SURVEY.md §4). This test closes the
loop cheaply: overfit a LightWeight-OpenPose head stack on one synthetic
5-keypoint figure and assert the on-device PAF decoder recovers the
ground-truth skeleton from the model's own predictions — proving the target
generators (data/targets.py), the staged loss (models/openpose.py), the
optimizer step and the decoder (ops/paf_decode.py) are mutually consistent.
"""
from enum import IntEnum
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from hyperpose_tpu.data.targets import openpose_targets
from hyperpose_tpu.models.openpose import LightWeightOpenPose, openpose_loss
from hyperpose_tpu.ops.paf_decode import PafDecoderConfig, paf_decode_batch
from hyperpose_tpu.utils.topology import Topology


class ChainPart(IntEnum):
    A = 0
    B = 1
    C = 2
    D = 3
    E = 4


CHAIN_TOPOLOGY = Topology(
    name="chain5",
    parts=ChainPart,
    limbs=np.array([[0, 1], [1, 2], [2, 3], [3, 4]], np.int32),
    flip_list=np.arange(5, dtype=np.int32),
)

# Keypoints sit near feature-cell centers (input px ~ 8*cell + 3.5) so the
# expected decode is unambiguous; limbs span 4-8 cells each. The scale is
# 16x16 feature cells: the conf generator's half-stride grid offset vs the
# paf generator's plain kpt/stride convention (both inherited from the
# reference, openpose/utils.py:65 vs :169) is a ~0.4-cell shift that only
# washes out with limbs several cells long. Limbs are AXIS-ALIGNED: at this
# resolution the 10 rounded line-integral samples of a diagonal limb fall
# off the 1-cell PAF ridge often enough that crit2 sits within noise of its
# threshold — the margin must not depend on training jitter.
GT_KPTS = np.array(
    [[27.5, 27.5], [91.5, 27.5], [91.5, 67.5], [59.5, 67.5], [59.5, 107.5]],
    np.float32,
)


class _ToyBackbone(nn.Module):
    """Minimal stride-8 conv stack standing in for a zoo backbone (also
    exercises the LightWeightOpenPose custom-backbone hook)."""

    scale_size: int = 8
    dtype: Any = jnp.float32
    pretraining: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate((16, 32, 64)):
            x = nn.relu(
                nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"c{i}")(x)
            )
        return x


def _render_figure(kpts: np.ndarray, hw=(64, 64)) -> np.ndarray:
    """Distinctly-colored Gaussian blobs at each keypoint."""
    palette = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [0, 1, 1]], np.float32
    )
    yy, xx = np.mgrid[0: hw[0], 0: hw[1]].astype(np.float32)
    img = np.zeros((*hw, 3), np.float32)
    for (x, y), color in zip(kpts, palette):
        blob = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2.0 * 3.0 ** 2))
        img += blob[..., None] * color
    return np.clip(img, 0.0, 1.0)


def test_training_learns_decodable_poses():
    hw, out_hw = (128, 128), (16, 16)
    batch = 2
    images = jnp.asarray(
        np.broadcast_to(_render_figure(GT_KPTS, hw), (batch, *hw, 3)).copy()
    )
    kpts = jnp.asarray(np.broadcast_to(GT_KPTS, (batch, 1, 5, 2)).copy())
    valid = jnp.ones((batch, 1, 5), bool)
    targets = openpose_targets(
        kpts, valid, CHAIN_TOPOLOGY.limbs, hw, out_hw, sigma=7.0
    )

    model = LightWeightOpenPose(
        n_confmaps=6, n_pafmaps=8, num_channels=32, backbone=_ToyBackbone
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": stats}, images, train=True,
                mutable=["batch_stats"],
            )
            loss, _ = openpose_loss(out, targets["conf_map"],
                                    targets["paf_map"])
            return loss, new_vars["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    first_loss = None
    loss = None
    for i in range(500):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        if first_loss is None:
            first_loss = float(loss)
        # Sharp maps matter as much as low loss: the decoder's crit2 margin
        # needs the PAF ridge close to saturation, so train past the point
        # where the loss merely "converged".
        if float(loss) < 0.004 * first_loss and i >= 150:
            break
    assert float(loss) < 0.1 * first_loss, (
        f"training did not converge: {first_loss:.4f} -> {float(loss):.4f}"
    )

    out, _ = model.apply(
        {"params": params, "batch_stats": stats}, images, train=True,
        mutable=["batch_stats"],
    )
    # crit1_thresh=6 is the reference's *python-eval* sample-count threshold
    # (openpose/processor.py vs paf.cpp:55); the C++ value of 8 assumes
    # 4x-upsampled decoding resolution.
    cfg = PafDecoderConfig(
        n_parts=5, n_limbs=4, max_peaks=8, max_candidates=16, max_humans=4,
        upsample=2, crit1_thresh=6, label_prop_iters=6,
    )
    decoded = paf_decode_batch(
        out["conf_map"].astype(jnp.float32),
        out["paf_map"].astype(jnp.float32),
        cfg, topology=CHAIN_TOPOLOGY,
    )
    decoded = jax.device_get(decoded)
    assert decoded.valid[0, 0], "no skeleton decoded from trained predictions"
    assert decoded.part_valid[0, 0].all(), (
        f"missing parts: {decoded.part_valid[0, 0]}"
    )
    est_px = decoded.coords[0, 0] * np.array([hw[1], hw[0]], np.float32)
    err = np.linalg.norm(est_px - GT_KPTS, axis=-1)
    assert (err < 5.0).all(), f"keypoint error px: {err}"
    # Exactly one person in the scene.
    assert decoded.valid[0].sum() == 1
