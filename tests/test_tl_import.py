"""Structural TL checkpoint import vs real reference naming/build order.

Unlike the round-1 test (which synthesized npz keys from our own flax tree
and therefore could not catch convention mismatches), these fixtures
(tests/tl_fixtures.py) replicate the reference TensorLayer models' actual
weight sequences — explicit + auto layer names, build order, b_init=None
conventions, TF depthwise layout — and every landmark assertion checks
that a parameter landed on its architecturally-correct flax leaf.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperpose_tpu.models.backbones import MobilenetDilated, Vgg19, VggTiny
from hyperpose_tpu.models.openpose import LightWeightOpenPose, OpenPose
from hyperpose_tpu.utils.tl_orders import lw_openpose_order, openpose_order
from hyperpose_tpu.utils.weights_import import (
    import_npz_dict, import_tl_checkpoint,
)

from tl_fixtures import lw_openpose_entries, openpose_entries, save_tl_npz_dict


def _leaf(tree, *path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


@pytest.fixture(scope="module")
def lw_vggtiny(tmp_path_factory):
    entries, marks = lw_openpose_entries("vggtiny")
    path = str(tmp_path_factory.mktemp("tl") / "lw_vggtiny.npz")
    save_tl_npz_dict(entries, path)
    model = LightWeightOpenPose(backbone=VggTiny)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    return model, variables, path, marks


def test_lw_vggtiny_structural_import(lw_vggtiny):
    model, variables, path, marks = lw_vggtiny
    out = import_tl_checkpoint(variables, path, lw_openpose_order)
    p, bs = out["params"], out["batch_stats"]

    # backbone: kernels on the right blocks, biases folded into bn means
    assert _leaf(p, "backbone", "block_0", "conv", "kernel").flat[0] == \
        marks["backbone_block_1_1_conv"]
    assert _leaf(p, "backbone", "block_8", "conv", "kernel").flat[0] == \
        marks["backbone_block_4_2_conv"]
    assert _leaf(bs, "backbone", "block_0", "bn", "mean").flat[0] == \
        marks["backbone_block_1_1_mean"] - marks["backbone_block_1_1_bias"]

    # cpm: the alphabetical-vs-build-order trap (end < init < m0 in flax)
    assert _leaf(p, "cpm", "init", "kernel").flat[0] == marks["cpm_init"]
    for i in range(3):
        assert _leaf(p, "cpm", f"m{i}", "cb", "conv", "kernel").flat[0] == \
            marks[f"cpm_m{i}"]
        assert _leaf(bs, "cpm", f"m{i}", "cb", "bn", "mean").flat[0] == \
            marks[f"cpm_m{i}_mean"] - marks[f"cpm_m{i}_bias"]
    assert _leaf(p, "cpm", "end", "kernel").flat[0] == marks["cpm_end"]

    # init heads vs refinement heads (identical shapes, order must hold)
    assert _leaf(p, "init_heads", "conf2", "kernel").flat[0] == \
        marks["init_conf2"]
    assert _leaf(p, "ref_heads", "conf2", "kernel").flat[0] == \
        marks["ref_conf2"]
    assert _leaf(p, "ref_heads", "paf1", "kernel").flat[0] == \
        marks["ref_paf1"]
    for b in range(5):
        assert _leaf(p, f"ref_b{b}", "init", "kernel").flat[0] == \
            marks[f"ref_b{b}_init"]
        assert _leaf(p, f"ref_b{b}", "c2", "cb", "conv", "kernel").flat[0] \
            == marks[f"ref_b{b}_c2"]

    # imported variables must actually run (values are index-coded fakes,
    # so magnitudes explode — only the plumbing/shapes are checked here)
    y = model.apply(
        {"params": p, "batch_stats": bs},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert np.asarray(y["conf_map"]).shape == (1, 8, 8, 19)


def test_kind_stream_matcher_would_rotate_cpm(lw_vggtiny):
    """Documents WHY the structural importer exists: the legacy heuristic
    mis-rotates the equal-shaped cpm kernels (build order init,m0..m2,end
    vs flax alphabetical end,init,m0..)."""
    _, variables, path, marks = lw_vggtiny
    out = import_npz_dict(variables, path, strict=False)
    got_end = _leaf(out["params"], "cpm", "end", "kernel").flat[0]
    assert got_end == marks["cpm_m0"]  # the rotation bug, pinned


def test_lw_mobilenet_dilated_structural_import(tmp_path):
    entries, marks = lw_openpose_entries("mobilenet_dilated")
    path = str(tmp_path / "lw_mbd.npz")
    save_tl_npz_dict(entries, path)
    model = LightWeightOpenPose(backbone=MobilenetDilated)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    out = import_tl_checkpoint(variables, path, lw_openpose_order)
    p = out["params"]
    assert _leaf(p, "backbone", "stem", "conv", "kernel").flat[0] == \
        marks["backbone_stem_conv"]
    # TF depthwise [3,3,C,1] reshaped to flax grouped [3,3,1,C]
    dw = _leaf(p, "backbone", "sep_4", "dw", "dwconv", "kernel")
    assert dw.shape == (3, 3, 1, 256)
    assert dw.flat[0] == marks["backbone_sep4_dw"]
    assert _leaf(p, "backbone", "sep_10", "pw", "kernel").flat[0] == \
        marks["backbone_sep10_pw"]
    assert _leaf(p, "cpm", "init", "kernel").shape == (1, 1, 512, 128)
    assert _leaf(p, "cpm", "init", "kernel").flat[0] == marks["cpm_init"]


def test_openpose_vgg19_structural_import(tmp_path):
    entries, marks = openpose_entries()
    path = str(tmp_path / "openpose.npz")
    save_tl_npz_dict(entries, path)
    model = OpenPose(backbone=Vgg19)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    out = import_tl_checkpoint(variables, path, openpose_order)
    p = out["params"]
    assert _leaf(p, "backbone", "conv_0", "kernel").flat[0] == \
        marks["backbone_conv0"]
    assert _leaf(p, "backbone", "conv_9", "bias").flat[0] == \
        marks["backbone_conv9"] + 1  # bias filled right after its kernel
    assert _leaf(p, "cpm1", "kernel").flat[0] == marks["cpm1"]
    assert _leaf(p, "cpm2", "kernel").flat[0] == marks["cpm2"]
    # conv->PRelu pairing and conf-before-paf ordering inside stages
    assert _leaf(p, "init_conf", "l3", "conv", "kernel").flat[0] == \
        marks["init_conf_l3"]
    assert _leaf(p, "init_paf", "out", "prelu", "alpha").flat[0] == \
        marks["init_paf_prelu4"]
    assert _leaf(p, "ref3_paf", "l5", "conv", "kernel").flat[0] == \
        marks["ref3_paf_l5"]
    assert _leaf(p, "ref4_conf", "out", "conv", "kernel").flat[0] == \
        marks["ref4_conf_l6"]


def test_structural_import_fails_loudly(tmp_path):
    entries, _ = lw_openpose_entries("vggtiny")
    model = LightWeightOpenPose(backbone=VggTiny)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    # drop one whole layer -> length mismatch
    truncated = [e for e in entries if not e[0].startswith("model/ref_paf2")]
    path = str(tmp_path / "broken1.npz")
    save_tl_npz_dict(truncated, path)
    with pytest.raises(ValueError, match="TL checkpoint import failed"):
        import_tl_checkpoint(variables, path, lw_openpose_order)

    # swap two layers of different shape -> shape mismatch at the point
    names = [e[0] for e in entries]
    i = names.index("model/conv2d_20/filters:0")      # cpm init 384->128
    j = names.index("model/conv2d_24/filters:0")      # cpm end 3x3
    swapped = list(entries)
    swapped[i], swapped[j] = (entries[i][0], entries[j][1]), \
        (entries[j][0], entries[i][1])
    path = str(tmp_path / "broken2.npz")
    save_tl_npz_dict(swapped, path)
    with pytest.raises(ValueError, match="does not fit"):
        import_tl_checkpoint(variables, path, lw_openpose_order)
