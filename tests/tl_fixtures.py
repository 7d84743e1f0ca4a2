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


def save_tl_npz_dict(entries, path):
    """Write entries preserving order, exactly like tl.files
    save_npz_dict (np.savez keeps kwargs insertion order in the zip)."""
    np.savez(path, **dict(entries))
    return path
