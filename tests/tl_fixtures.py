"""Synthesized TensorLayer npz_dict checkpoints with REAL reference
naming/build order — fixtures for the structural importer tests.

Each builder transcribes the weight sequence a reference model writes via
`save_weights(format="npz_dict")`: layer construction order, TL parameter
names (filters/biases, gamma/beta/moving_mean/moving_var, alpha), bias
conventions (b_init=None on depthwise/pointwise convs, biases on convs
that precede BN), and TF depthwise kernel layout [H, W, C, 1].

Sources transcribed:
  - vggtiny_backbone (reference: Model/backbones.py:343-390)
  - MobilenetDilated_backbone (backbones.py:201-226, dw_conv_block
    lw_openpose.py:200-207)
  - vgg19_backbone (backbones.py:447-510)
  - LightWeightOpenPose stages (lw_openpose.py:33-191)
  - OpenPose CMU stages (openpose/model/openpose.py:14-199)

Every array is filled with a unique integer constant; builders return
(entries, landmarks) where landmarks name architecturally-significant
entries for semantic spot checks.
"""
import numpy as np

_COUNTER = [0]


def _fill(shape):
    _COUNTER[0] += 1
    return np.full(shape, float(_COUNTER[0]), np.float32)


def conv(name, kh, kw, cin, cout, bias=True):
    e = [(f"{name}/filters:0", _fill((kh, kw, cin, cout)))]
    if bias:
        e.append((f"{name}/biases:0", _fill((cout,))))
    return e


def dwconv(name, kh, kw, cin):
    # TF/TL depthwise kernel layout [H, W, C, multiplier]; b_init=None
    return [(f"{name}/filters:0", _fill((kh, kw, cin, 1)))]


def bn(name, c):
    return [
        (f"{name}/beta:0", _fill((c,))),
        (f"{name}/gamma:0", _fill((c,))),
        (f"{name}/moving_mean:0", _fill((c,))),
        (f"{name}/moving_var:0", _fill((c,))),
    ]


def prelu(name, c):
    return [(f"{name}/alpha:0", _fill((c,)))]


def _reset():
    _COUNTER[0] = 0


# ---------------------------------------------------------------------------
# backbones
# ---------------------------------------------------------------------------

def vggtiny_backbone_entries():
    """9 conv+bn blocks (backbones.py:352-365); convs carry biases."""
    chans = [(3, 32), (32, 64), (64, 128), (128, 128), (128, 200),
             (200, 200), (200, 200), (200, 384), (384, 384)]
    names = ["block_1_1", "block_1_2", "block_2_1", "block_2_2",
             "block_3_1", "block_3_2", "block_3_3", "block_4_1",
             "block_4_2"]
    entries, marks = [], {}
    for (cin, cout), name in zip(chans, names):
        ce = conv(f"vggtiny_backbone/{name}_conv1", 3, 3, cin, cout)
        be = bn(f"vggtiny_backbone/{name}_bn1", cout)
        entries += ce + be
        marks[f"backbone_{name}_conv"] = ce[0][1].flat[0]
        marks[f"backbone_{name}_bias"] = ce[1][1].flat[0]
        marks[f"backbone_{name}_mean"] = be[2][1].flat[0]
    return entries, marks


def mobilenet_dilated_backbone_entries():
    """stem conv_block + 11 dw blocks (backbones.py:213-226)."""
    entries, marks = [], {}
    ce = conv("mobilenetdilated_backbone/conv2d", 3, 3, 3, 32)
    be = bn("mobilenetdilated_backbone/batchnorm2d", 32)
    entries += ce + be
    marks["backbone_stem_conv"] = ce[0][1].flat[0]
    marks["backbone_stem_bias"] = ce[1][1].flat[0]
    marks["backbone_stem_mean"] = be[2][1].flat[0]
    dims = [(32, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 512), (512, 512), (512, 512), (512, 512), (512, 512),
            (512, 512)]
    for i, (cin, cout) in enumerate(dims):
        de = dwconv(f"mobilenetdilated_backbone/depthwiseconv2d_{i}", 3, 3, cin)
        b1 = bn(f"mobilenetdilated_backbone/batchnorm2d_{2*i+1}", cin)
        pe = conv(f"mobilenetdilated_backbone/conv2d_{i+1}", 1, 1, cin, cout,
                  bias=False)
        b2 = bn(f"mobilenetdilated_backbone/batchnorm2d_{2*i+2}", cout)
        entries += de + b1 + pe + b2
        marks[f"backbone_sep{i}_dw"] = de[0][1].flat[0]
        marks[f"backbone_sep{i}_pw"] = pe[0][1].flat[0]
    return entries, marks


def vgg19_backbone_entries():
    """10 plain convs with biases, no BN (backbones.py:447+)."""
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 256), (256, 512), (512, 512)]
    entries, marks = [], {}
    for i, (cin, cout) in enumerate(chans):
        ce = conv(f"vgg19_backbone/conv2d_{i}", 3, 3, cin, cout)
        entries += ce
        marks[f"backbone_conv{i}"] = ce[0][1].flat[0]
    return entries, marks


# ---------------------------------------------------------------------------
# LightWeightOpenPose (lw_openpose.py)
# ---------------------------------------------------------------------------

def lw_openpose_entries(backbone="vggtiny", n_confmaps=19, n_pafmaps=38):
    _reset()
    if backbone == "vggtiny":
        entries, marks = vggtiny_backbone_entries()
        bb_out = 384
    elif backbone == "mobilenet_dilated":
        entries, marks = mobilenet_dilated_backbone_entries()
        bb_out = 512
    else:
        raise ValueError(backbone)

    # cpm stage: init 1x1, 3x (conv+bn) main blocks, end 3x3
    ce = conv("model/conv2d_20", 1, 1, bb_out, 128)
    entries += ce
    marks["cpm_init"] = ce[0][1].flat[0]
    for i in range(3):
        cb = conv(f"model/conv2d_{21+i}", 3, 3, 128, 128)
        bb = bn(f"model/batchnorm2d_{20+i}", 128)
        entries += cb + bb
        marks[f"cpm_m{i}"] = cb[0][1].flat[0]
        marks[f"cpm_m{i}_bias"] = cb[1][1].flat[0]
        marks[f"cpm_m{i}_mean"] = bb[2][1].flat[0]
    ce = conv("model/conv2d_24", 3, 3, 128, 128)
    entries += ce
    marks["cpm_end"] = ce[0][1].flat[0]

    # init stage: 3 main convs, conf head (512 -> n_conf), paf head
    for i in range(3):
        cb = conv(f"model/conv2d_{25+i}", 3, 3, 128, 128)
        entries += cb
        marks[f"init_m{i}"] = cb[0][1].flat[0]
    for branch, nout in (("conf", n_confmaps), ("paf", n_pafmaps)):
        c1 = conv(f"model/conv2d_{branch}1", 1, 1, 128, 512)
        c2 = conv(f"model/conv2d_{branch}2", 1, 1, 512, nout)
        entries += c1 + c2
        marks[f"init_{branch}1"] = c1[0][1].flat[0]
        marks[f"init_{branch}2"] = c2[0][1].flat[0]

    # refinement stage: 5 blocks (init 1x1 + 2x(conv+bn)), conf/paf heads
    in_ch = 128 + n_confmaps + n_pafmaps
    for b in range(5):
        ci = conv(f"model/ref_b{b}_init", 1, 1, in_ch if b == 0 else 128, 128)
        entries += ci
        marks[f"ref_b{b}_init"] = ci[0][1].flat[0]
        for c in (1, 2):
            cb = conv(f"model/ref_b{b}_c{c}", 3, 3, 128, 128)
            bb = bn(f"model/ref_b{b}_c{c}_bn", 128)
            entries += cb + bb
            marks[f"ref_b{b}_c{c}"] = cb[0][1].flat[0]
    for branch, nout in (("conf", n_confmaps), ("paf", n_pafmaps)):
        c1 = conv(f"model/ref_{branch}1", 1, 1, 128, 512)
        c2 = conv(f"model/ref_{branch}2", 1, 1, 512, nout)
        entries += c1 + c2
        marks[f"ref_{branch}1"] = c1[0][1].flat[0]
        marks[f"ref_{branch}2"] = c2[0][1].flat[0]
    return entries, marks


# ---------------------------------------------------------------------------
# OpenPose (CMU VGG19; openpose/model/openpose.py)
# ---------------------------------------------------------------------------

def openpose_entries(n_confmaps=19, n_pafmaps=38):
    _reset()
    entries, marks = vgg19_backbone_entries()
    for i, (cin, cout) in enumerate(((512, 256), (256, 128))):
        ce = conv(f"model/cpm_conv{i}", 3, 3, cin, cout)
        entries += ce
        marks[f"cpm{i+1}"] = ce[0][1].flat[0]

    def stage(tag, in_ch, ksize, mids, nout):
        """conf/paf block: mids (k x k) convs, bottleneck, out — each
        followed by PRelu (openpose.py:119-199)."""
        seq = []
        cin = in_ch
        specs = []
        for i in range(mids):
            specs.append((ksize, ksize, cin, 128))
            cin = 128
        if tag.startswith("init"):
            specs.append((1, 1, 128, 512))  # bottleneck to 512
            specs.append((1, 1, 512, nout))
        else:
            specs.append((1, 1, 128, 128))
            specs.append((1, 1, 128, nout))
        for i, (kh, kw, ci, co) in enumerate(specs):
            ce = conv(f"model/{tag}_conv{i}", kh, kw, ci, co)
            pe = prelu(f"model/{tag}_prelu{i}", co)
            seq += ce + pe
            marks[f"{tag}_l{i}"] = ce[0][1].flat[0]
            marks[f"{tag}_prelu{i}"] = pe[0][1].flat[0]
        return seq

    entries += stage("init_conf", 128, 3, 3, n_confmaps)
    entries += stage("init_paf", 128, 3, 3, n_pafmaps)
    in_ch = 128 + n_confmaps + n_pafmaps
    for r in range(5):
        entries += stage(f"ref{r}_conf", in_ch, 7, 5, n_confmaps)
        entries += stage(f"ref{r}_paf", in_ch, 7, 5, n_pafmaps)
    return entries, marks


def sepconv2d(name, kh, kw, cin, cout):
    """tl.layers.SeparableConv2d: dw + pw + bias in ONE layer
    (mbv2_sm_openpose.py:166-170); TF dw layout [H, W, C, 1]."""
    return [
        (f"{name}/depthwise_filters:0", _fill((kh, kw, cin, 1))),
        (f"{name}/pointwise_filters:0", _fill((1, 1, cin, cout))),
        (f"{name}/biases:0", _fill((cout,))),
    ]


# ---------------------------------------------------------------------------
# ResNet backbones
# ---------------------------------------------------------------------------

def resnet18_backbone_entries():
    """conv_1_1 (no bias) + bn_1_1, then res blocks 2_1..5_1; per block the
    MAIN LayerList (conv_1,bn_1,conv_2,bn_2) is constructed before the
    down_sample (conv,bn) (reference: backbones.py:512-561); all convs
    b_init=None."""
    entries, marks = [], {}
    ce = conv("resnet18_backbone/conv_1_1", 7, 7, 3, 64, bias=False)
    be = bn("resnet18_backbone/bn_1_1", 64)
    entries += ce + be
    marks["backbone_stem_conv"] = ce[0][1].flat[0]
    blocks = [("2_1", 64, 64, False), ("2_2", 64, 64, False),
              ("3_1", 64, 128, True), ("3_2", 128, 128, False),
              ("4_1", 128, 256, True), ("4_2", 256, 256, False),
              ("5_1", 256, 512, True)]
    for name, cin, cout, ds in blocks:
        c1 = conv(f"resnet18_backbone/block_{name}_conv_1", 3, 3, cin, cout,
                  bias=False)
        entries += c1 + bn(f"resnet18_backbone/block_{name}_bn_1", cout)
        c2 = conv(f"resnet18_backbone/block_{name}_conv_2", 3, 3, cout, cout,
                  bias=False)
        entries += c2 + bn(f"resnet18_backbone/block_{name}_bn_2", cout)
        marks[f"backbone_b{name}_conv1"] = c1[0][1].flat[0]
        marks[f"backbone_b{name}_conv2"] = c2[0][1].flat[0]
        if ds:
            cd = conv(f"resnet18_backbone/block_{name}_downsample_conv", 1, 1,
                      cin, cout, bias=False)
            entries += cd + bn(f"resnet18_backbone/block_{name}_downsample_bn",
                               cout)
            marks[f"backbone_b{name}_ds"] = cd[0][1].flat[0]
    return entries, marks


def resnet50_backbone_entries():
    """conv1 (no bias) + bn1, bottleneck blocks 1_1..4_3; per block the
    DOWNSAMPLE LayerList is constructed BEFORE main_block (reference:
    backbones.py:587-697) — the opposite of resnet18."""
    entries, marks = [], {}
    ce = conv("resnet50_backbone/conv1", 7, 7, 3, 64, bias=False)
    be = bn("resnet50_backbone/bn1", 64)
    entries += ce + be
    marks["backbone_stem_conv"] = ce[0][1].flat[0]
    plan = [(1, 64, 64, 3), (2, 256, 128, 4), (3, 512, 256, 6),
            (4, 1024, 512, 3)]
    for g, cin0, n, count in plan:
        for i in range(1, count + 1):
            cin = cin0 if i == 1 else 4 * n
            name = f"block_{g}_{i}"
            has_ds = (i == 1)  # strides != 1 or cin != 4n on first block
            if has_ds:
                cd = conv(f"resnet50_backbone/{name}_ds_conv1", 1, 1, cin,
                          4 * n, bias=False)
                entries += cd + bn(f"resnet50_backbone/{name}_ds_bn1", 4 * n)
                marks[f"backbone_b{g}_{i}_ds"] = cd[0][1].flat[0]
            c1 = conv(f"resnet50_backbone/{name}_conv1", 1, 1, cin, n,
                      bias=False)
            entries += c1 + bn(f"resnet50_backbone/{name}_bn1", n)
            c2 = conv(f"resnet50_backbone/{name}_conv2", 3, 3, n, n,
                      bias=False)
            entries += c2 + bn(f"resnet50_backbone/{name}_bn2", n)
            c3 = conv(f"resnet50_backbone/{name}_conv3", 1, 1, n, 4 * n,
                      bias=False)
            entries += c3 + bn(f"resnet50_backbone/{name}_bn3", 4 * n)
            marks[f"backbone_b{g}_{i}_conv1"] = c1[0][1].flat[0]
            marks[f"backbone_b{g}_{i}_conv3"] = c3[0][1].flat[0]
    return entries, marks


# ---------------------------------------------------------------------------
# PoseProposal (pose_proposal/model.py:37-78)
# ---------------------------------------------------------------------------

def ppn_entries(K=18, L=17, hnei=9, wnei=9):
    _reset()
    entries, marks = resnet18_backbone_entries()
    out_dim = 6 * K + hnei * wnei * L
    for i, name in enumerate(("add_block_1", "add_block_2")):
        ce = conv(f"model/{name}_conv_1", 3, 3, 512, 512)     # bias kept
        be = bn(f"model/{name}_bn_1", 512)
        entries += ce + be
        marks[f"add{i+1}_conv"] = ce[0][1].flat[0]
        marks[f"add{i+1}_bias"] = ce[1][1].flat[0]
    ce = conv("model/add_block_3_conv_1", 1, 1, 512, out_dim)
    entries += ce
    marks["head_conv"] = ce[0][1].flat[0]
    marks["head_bias"] = ce[1][1].flat[0]
    return entries, marks


# ---------------------------------------------------------------------------
# PifPaf (pifpaf/model.py:36-60,215-281)
# ---------------------------------------------------------------------------

def pifpaf_entries(n_pos=17, n_limbs=19, quad_size=2):
    _reset()
    entries, marks = resnet50_backbone_entries()
    q2 = quad_size ** 2
    ce = conv("model/pif_head_conv", 1, 1, 2048, n_pos * 5 * q2)
    entries += ce
    marks["pif_head"] = ce[0][1].flat[0]
    marks["pif_head_bias"] = ce[1][1].flat[0]
    ce = conv("model/paf_head_conv", 1, 1, 2048, n_limbs * 9 * q2)
    entries += ce
    marks["paf_head"] = ce[0][1].flat[0]
    return entries, marks


# ---------------------------------------------------------------------------
# Mobilenet-Thin / -Small OpenPose (mbv2_th_openpose.py, mbv2_sm_openpose.py)
# ---------------------------------------------------------------------------

def _sep_bn_block(name, kh, kw, cin, cout, marks, mark):
    """Thin separable_block: dw (no bias) + bn(cin) + pw (no bias) +
    bn(cout) (mbv2_th_openpose.py:171-178)."""
    de = dwconv(f"{name}_dw", kh, kw, cin)
    b1 = bn(f"{name}_bn1", cin)
    pe = conv(f"{name}_pw", 1, 1, cin, cout, bias=False)
    b2 = bn(f"{name}_bn2", cout)
    marks[f"{mark}_dw"] = de[0][1].flat[0]
    marks[f"{mark}_pw"] = pe[0][1].flat[0]
    return de + b1 + pe + b2


def mobilenet_thin_backbone_entries():
    """conv_block_0 (conv WITH bias + bn) then 11 thin separable blocks
    (backbones.py:250-297)."""
    entries, marks = [], {}
    ce = conv("mobilenetthin_backbone/convblock_0_conv", 3, 3, 3, 32)
    be = bn("mobilenetthin_backbone/convblock_0_bn", 32)
    entries += ce + be
    marks["backbone_stem_conv"] = ce[0][1].flat[0]
    marks["backbone_stem_bias"] = ce[1][1].flat[0]
    dims = [(32, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 512), (512, 512), (512, 512), (512, 512), (512, 512),
            (512, 512)]
    for i, (cin, cout) in enumerate(dims):
        entries += _sep_bn_block(
            f"mobilenetthin_backbone/convblock_{i+1}", 3, 3, cin, cout,
            marks, f"backbone_sep{i}",
        )
    return entries, marks


def mobilenet_small_backbone_entries():
    """conv_block_0 (conv WITH bias + bn) then 7 thin-style separable blocks
    (backbones.py:299-341)."""
    entries, marks = [], {}
    ce = conv("mobilenetsmall_backbone/convblock_0_conv", 3, 3, 3, 32)
    be = bn("mobilenetsmall_backbone/convblock_0_bn", 32)
    entries += ce + be
    marks["backbone_stem_conv"] = ce[0][1].flat[0]
    marks["backbone_stem_bias"] = ce[1][1].flat[0]
    dims = [(32, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 512), (512, 512)]
    for i, (cin, cout) in enumerate(dims):
        entries += _sep_bn_block(
            f"mobilenetsmall_backbone/convblock_{i+1}", 3, 3, cin, cout,
            marks, f"backbone_sep{i}",
        )
    return entries, marks


def thin_openpose_entries(n_confmaps=19, n_pafmaps=38):
    """Backbone + init stage + 5 refinement stages; each stage builds its
    conf block (5 thin separable blocks) fully, then its paf block
    (mbv2_th_openpose.py:14-162)."""
    _reset()
    entries, marks = mobilenet_thin_backbone_entries()
    bb_out = 1152

    def stage(tag, in_ch, plans, nout):
        seq = []
        specs = list(plans) + [(nout, 1)]
        cin = in_ch
        for i, (f, k) in enumerate(specs):
            mark = f"{tag}_l{i}" if i < len(plans) else f"{tag}_out"
            seq.extend(_sep_bn_block(f"model/{tag}_sep{i}", k, k, cin, f,
                                     marks, mark))
            cin = f
        return seq

    init_plan = [(128, 3), (128, 3), (128, 3), (512, 1)]
    ref_plan = [(128, 3), (128, 3), (128, 3), (128, 1)]
    entries += stage("init_conf", bb_out, init_plan, n_confmaps)
    entries += stage("init_paf", bb_out, init_plan, n_pafmaps)
    in_ch = bb_out + n_confmaps + n_pafmaps
    for r in range(5):
        entries += stage(f"ref{r}_conf", in_ch, ref_plan, n_confmaps)
        entries += stage(f"ref{r}_paf", in_ch, ref_plan, n_pafmaps)
    return entries, marks


def small_openpose_entries(n_confmaps=19, n_pafmaps=38):
    """Backbone + init stage + 4 refinement stages; each stage block is a
    SeparableConv2d FOLLOWED BY BatchNorm2d — separable_block appends both
    (mbv2_sm_openpose.py:103-157,166-171)."""
    _reset()
    entries, marks = mobilenet_small_backbone_entries()
    bb_out = 704

    def stage(tag, in_ch, plans, nout):
        seq = []
        specs = list(plans) + [(nout, 1)]
        cin = in_ch
        for i, (f, k) in enumerate(specs):
            mark = f"{tag}_l{i}" if i < len(plans) else f"{tag}_out"
            se = sepconv2d(f"model/{tag}_sepconv{i}", k, k, cin, f)
            marks[f"{mark}_dw"] = se[0][1].flat[0]
            marks[f"{mark}_pw"] = se[1][1].flat[0]
            marks[f"{mark}_bias"] = se[2][1].flat[0]
            seq.extend(se)
            bne = bn(f"model/{tag}_bn{i}", f)
            marks[f"{mark}_bn"] = bne[0][1].flat[0]
            seq.extend(bne)
            cin = f
        return seq

    init_plan = [(128, 3), (128, 3), (128, 3), (512, 1)]
    ref_plan = [(128, 7), (128, 7), (128, 7), (128, 1)]
    entries += stage("init_conf", bb_out, init_plan, n_confmaps)
    entries += stage("init_paf", bb_out, init_plan, n_pafmaps)
    in_ch = bb_out + n_confmaps + n_pafmaps
    for r in range(4):
        entries += stage(f"ref{r}_conf", in_ch, ref_plan, n_confmaps)
        entries += stage(f"ref{r}_paf", in_ch, ref_plan, n_pafmaps)
    return entries, marks


def save_tl_npz_dict(entries, path):
    """Write entries preserving order, exactly like tl.files
    save_npz_dict (np.savez keeps kwargs insertion order in the zip)."""
    np.savez(path, **dict(entries))
    return path
