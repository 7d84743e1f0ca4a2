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


# ---------------------------------------------------------------------------
# Round-3 zoo coverage: PoseProposal, PifPaf, MobilenetThin/Small variants
# ---------------------------------------------------------------------------

def test_ppn_resnet18_structural_import(tmp_path):
    """Resnet18 build order (main block BEFORE downsample) + PPN head;
    the reference head convs keep their biases (no BN folding needed for
    add blocks since our ConvBN uses use_bias=True there)."""
    from hyperpose_tpu.models.pose_proposal import PoseProposal
    from hyperpose_tpu.utils.tl_orders import ppn_order
    from tl_fixtures import ppn_entries

    entries, marks = ppn_entries()
    path = str(tmp_path / "ppn.npz")
    save_tl_npz_dict(entries, path)
    model = PoseProposal()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=True
    )
    out = import_tl_checkpoint(variables, path, ppn_order)
    p = out["params"]
    assert _leaf(p, "backbone", "stem", "conv", "kernel").flat[0] == \
        marks["backbone_stem_conv"]
    # equal-shaped main convs vs downsample within one block: order must
    # place conv_1, conv_2 first, then the 1x1 downsample (r18 convention)
    assert _leaf(p, "backbone", "b3_1", "cb1", "conv", "kernel").flat[0] == \
        marks["backbone_b3_1_conv1"]
    assert _leaf(p, "backbone", "b3_1", "ds", "conv", "kernel").flat[0] == \
        marks["backbone_b3_1_ds"]
    assert _leaf(p, "backbone", "b5_1", "cb2", "conv", "kernel").flat[0] == \
        marks["backbone_b5_1_conv2"]
    # head: biases arrive directly (use_bias=True convs)
    assert _leaf(p, "add1", "conv", "kernel").flat[0] == marks["add1_conv"]
    assert _leaf(p, "add1", "conv", "bias").flat[0] == marks["add1_bias"]
    assert _leaf(p, "add2", "conv", "kernel").flat[0] == marks["add2_conv"]
    assert _leaf(p, "head", "kernel").flat[0] == marks["head_conv"]
    assert _leaf(p, "head", "bias").flat[0] == marks["head_bias"]


def test_pifpaf_resnet50_structural_import(tmp_path):
    """Resnet50 build order (downsample BEFORE main block — opposite of
    r18) + the two pixel-shuffle head convs."""
    from hyperpose_tpu.models.pifpaf import Pifpaf
    from hyperpose_tpu.utils.tl_orders import pifpaf_order
    from tl_fixtures import pifpaf_entries

    entries, marks = pifpaf_entries()
    path = str(tmp_path / "pifpaf.npz")
    save_tl_npz_dict(entries, path)
    model = Pifpaf()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    out = import_tl_checkpoint(variables, path, pifpaf_order)
    p = out["params"]
    assert _leaf(p, "backbone", "stem", "conv", "kernel").flat[0] == \
        marks["backbone_stem_conv"]
    # ds-first ordering: within b1_1 the 1x1 ds conv precedes cb1's 1x1 —
    # both are (1,1,64,...) so only the transcribed order separates them
    assert _leaf(p, "backbone", "b1_1", "ds", "conv", "kernel").flat[0] == \
        marks["backbone_b1_1_ds"]
    assert _leaf(p, "backbone", "b1_1", "cb1", "conv", "kernel").flat[0] == \
        marks["backbone_b1_1_conv1"]
    assert _leaf(p, "backbone", "b3_6", "cb3", "conv", "kernel").flat[0] == \
        marks["backbone_b3_6_conv3"]
    assert _leaf(p, "backbone", "b4_3", "cb1", "conv", "kernel").flat[0] == \
        marks["backbone_b4_3_conv1"]
    assert _leaf(p, "pif_head", "kernel").flat[0] == marks["pif_head"]
    assert _leaf(p, "pif_head", "bias").flat[0] == marks["pif_head_bias"]
    assert _leaf(p, "paf_head", "kernel").flat[0] == marks["paf_head"]


def test_thin_openpose_structural_import(tmp_path):
    """Thin variant: conv_block stem bias folds into BN mean; stage blocks
    are dw+bn1+pw+bn2; conf block fully before paf block per stage."""
    from hyperpose_tpu.models.openpose import MobilenetThinOpenpose
    from hyperpose_tpu.utils.tl_orders import thin_small_openpose_order
    from tl_fixtures import thin_openpose_entries

    entries, marks = thin_openpose_entries()
    path = str(tmp_path / "thin.npz")
    save_tl_npz_dict(entries, path)
    model = MobilenetThinOpenpose()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    out = import_tl_checkpoint(variables, path, thin_small_openpose_order)
    p, bs = out["params"], out["batch_stats"]
    assert _leaf(p, "backbone", "stem", "conv", "kernel").flat[0] == \
        marks["backbone_stem_conv"]
    # bn moving_mean is filled 4 slots after the conv kernel; the conv
    # bias (kernel+1) folds into it: mean' = mean - bias
    assert _leaf(bs, "backbone", "stem", "bn", "mean").flat[0] == \
        (marks["backbone_stem_conv"] + 4) - marks["backbone_stem_bias"]
    dw = _leaf(p, "backbone", "sep_6", "dw", "dwconv", "kernel")
    assert dw.shape == (3, 3, 1, 512)
    assert dw.flat[0] == marks["backbone_sep6_dw"]
    # stage blocks: equal-shaped 128->128 runs across conf/paf branches
    assert _leaf(p, "init_conf", "l1", "dw", "dwconv", "kernel").flat[0] == \
        marks["init_conf_l1_dw"]
    assert _leaf(p, "init_paf", "l1", "pw", "kernel").flat[0] == \
        marks["init_paf_l1_pw"]
    assert _leaf(p, "ref4_paf", "out", "pw", "kernel").flat[0] == \
        marks["ref4_paf_out_pw"]
    y = model.apply(
        {"params": p, "batch_stats": bs},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    assert np.asarray(y["conf_map"]).shape == (1, 8, 8, 19)


def test_small_openpose_structural_import(tmp_path):
    """Small variant: each stage block is a TL SeparableConv2d (dw + pw +
    bias) followed by a BatchNorm2d (mbv2_sm_openpose.py:166-171), mapping
    onto our _SepSmallBlock {sep, bn} modules."""
    from hyperpose_tpu.models.openpose import MobilenetSmallOpenpose
    from hyperpose_tpu.utils.tl_orders import thin_small_openpose_order
    from tl_fixtures import small_openpose_entries

    entries, marks = small_openpose_entries()
    path = str(tmp_path / "small.npz")
    save_tl_npz_dict(entries, path)
    model = MobilenetSmallOpenpose()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
    )
    out = import_tl_checkpoint(variables, path, thin_small_openpose_order)
    p = out["params"]
    assert _leaf(p, "backbone", "stem", "conv", "kernel").flat[0] == \
        marks["backbone_stem_conv"]
    # sepconv triplets: TF dw [7,7,128,1] -> flax [7,7,1,128]
    dw = _leaf(p, "ref2_conf", "l1", "sep", "dw_kernel")
    assert dw.shape == (7, 7, 1, 128)
    assert dw.flat[0] == marks["ref2_conf_l1_dw"]
    assert _leaf(p, "ref2_conf", "l1", "sep", "pw_kernel").flat[0] == \
        marks["ref2_conf_l1_pw"]
    assert _leaf(p, "ref2_conf", "l1", "sep", "bias").flat[0] == \
        marks["ref2_conf_l1_bias"]
    assert _leaf(p, "init_paf", "out", "sep", "pw_kernel").flat[0] == \
        marks["init_paf_out_pw"]
    # per-block BN right after the sepconv (beta marks come first in the
    # TL BatchNorm entry order)
    assert _leaf(p, "ref2_conf", "l1", "bn", "bias").flat[0] == \
        marks["ref2_conf_l1_bn"]
    y = model.apply(
        {"params": p, "batch_stats": out["batch_stats"]},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    # the small trunk concat sits at stride 4 (reference: backbones.py
    # MobilenetSmall_backbone forward)
    assert np.asarray(y["conf_map"]).shape == (1, 16, 16, 19)
