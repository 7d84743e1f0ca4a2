"""Shape tests for backbones and OpenPose-family models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpose_tpu.models.backbones import BACKBONES
from hyperpose_tpu.models.openpose import (
    LightWeightOpenPose, MobilenetSmallOpenpose, MobilenetThinOpenpose,
    OpenPose, openpose_loss,
)

H = W = 64


@pytest.mark.parametrize("name", sorted(BACKBONES))
def test_backbone_shapes(name):
    cls = BACKBONES[name]
    model = cls(scale_size=8)
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    # MobilenetSmall concatenates its features at stride 4
    # (reference: backbones.py:327-341).
    stride = {"MobilenetSmall": 4}.get(name, 8)
    assert y.shape[0] == 1
    assert y.shape[1] == H // stride and y.shape[2] == W // stride
    expected_c = model.out_channels
    assert y.shape[3] == expected_c, f"{name}: {y.shape} vs C={expected_c}"


@pytest.mark.parametrize(
    "ctor", [OpenPose, LightWeightOpenPose, MobilenetThinOpenpose,
             MobilenetSmallOpenpose],
    ids=["openpose", "lw", "thin", "small"],
)
def test_openpose_family_shapes(ctor):
    model = ctor()
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # The small variant's backbone emits stride-4 features.
    s = 4 if ctor is MobilenetSmallOpenpose else 8
    assert out["conf_map"].shape == (1, H // s, W // s, 19)
    assert out["paf_map"].shape == (1, H // s, W // s, 38)
    assert len(out["stage_confs"]) == len(out["stage_pafs"])
    assert len(out["stage_confs"]) >= 2


def test_openpose_loss_decreases_on_perfect_prediction():
    model = LightWeightOpenPose()
    x = jnp.zeros((2, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    gt_conf = np.asarray(out["conf_map"])
    gt_paf = np.asarray(out["paf_map"])
    loss_same, parts = openpose_loss(out, gt_conf, gt_paf)
    assert float(loss_same) < 1e-8
    loss_diff, _ = openpose_loss(out, gt_conf + 1.0, gt_paf)
    assert float(loss_diff) > float(loss_same)
    assert "conf_loss" in parts and "paf_loss" in parts


def test_train_mode_has_batch_stats():
    model = LightWeightOpenPose()
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in updates


def test_vggtiny_s2d_backbone():
    """TPU-native space-to-depth TinyVGG: same stride/out_channels as the
    faithful TinyVGG, usable through the facade."""
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu import Config, Model
    from hyperpose_tpu.models.backbones import VggTiny, VggTinyS2D

    m = VggTinyS2D(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    ref = VggTiny(dtype=jnp.float32)
    vr = ref.init(jax.random.PRNGKey(0), x, train=False)
    assert out.shape == ref.apply(vr, x, train=False).shape

    Config.reset()
    Config.set_model_type(Config.MODEL.LightweightOpenpose)
    Config.set_model_backbone(Config.BACKBONE.VggtinyS2D)
    cfg = Config.get_config(create_dirs=False)
    model = Model.get_model(cfg)
    v2 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), model.dtype),
                    train=False)
    o2 = model.apply(v2, jnp.zeros((1, 64, 96, 3), model.dtype), train=False)
    assert o2["conf_map"].shape[1:3] == (8, 12)
    Config.reset()


def test_vggtiny_s2d_remap_exact():
    """VggTinyS2DStem + remap_vggtiny_to_s2d computes the IDENTICAL
    function as VggTiny (serving transform for the flagship; kernels
    phase-decomposed, BN tiled, first pool -> phase max)."""
    import jax
    import jax.numpy as jnp

    from hyperpose_tpu.models.backbones import (
        VggTiny, VggTinyS2DStem, remap_vggtiny_to_s2d,
    )
    from hyperpose_tpu.models.openpose import LightWeightOpenPose

    m1 = LightWeightOpenPose(backbone=VggTiny)
    m2 = LightWeightOpenPose(backbone=VggTinyS2DStem)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 96, 3))
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = remap_vggtiny_to_s2d(v1)
    y1 = m1.apply(v1, x, train=False)
    y2 = m2.apply(v2, x, train=False)
    for k in ("conf_map", "paf_map"):
        a, b = y1[k], y2[k]
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5, k
    # the s2d variables really do init-match the S2D module's structure
    ref = m2.init(jax.random.PRNGKey(1), x, train=False)
    s1 = jax.tree_util.tree_structure(ref)
    s2 = jax.tree_util.tree_structure(v2)
    assert s1 == s2
