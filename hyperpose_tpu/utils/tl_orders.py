"""Reference-build-order keys for the structural TL checkpoint importer.

Each function maps a flax LAYER path (tuple of module names, leaf dropped)
to a sortable key such that sorting our layers by it reproduces the
reference TensorLayer model's build order — the order its npz_dict
checkpoints store weights in. The orders are transcriptions of the
reference model constructors:

  - LW-OpenPose: backbone, cpm (init, m0..m2, end), init stage (3 main
    convs, conf head, paf head), refinement stage (5 blocks of
    init+c1+c2, conf head, paf head)
    (reference: openpose/model/lw_openpose.py:33-191)
  - OpenPose (VGG19): backbone, cpm1, cpm2, init stage (conf block then
    paf block), 5 refinement stages (conf then paf), conv->PRelu pairs
    within every block (reference: openpose/model/openpose.py:14-199)
  - backbones: VGGtiny 9 conv+bn blocks (backbones.py:343-390),
    MobilenetDilated stem conv_block + 11 dw blocks (backbones.py:201-226),
    VGG19 10 plain convs (backbones.py:447+)
"""
from __future__ import annotations

_INF = (10**6,)


def _num_suffix(name: str, prefix: str) -> int:
    return int(name[len(prefix):])


def _conv_then_bn(leafdir: str) -> int:
    # within one reference block, conv weights precede its BN weights
    return {"conv": 0, "dwconv": 0, "bn": 1}.get(leafdir, 0)


def _backbone_suborder(path: tuple) -> tuple:
    """path is the flax layer path minus the leading 'backbone'."""
    head = path[0]
    if head == "stem":                     # MobilenetDilated stem conv+bn
        return (0, 0, _conv_then_bn(path[-1]))
    if head.startswith("sep_"):            # dw, bn1, pw, bn2 per block
        n = _num_suffix(head, "sep_")
        sub = {"dw": 0, "bn1": 1, "pw": 2, "bn2": 3}[path[1]]
        return (1, n, sub)
    if head.startswith("block_"):          # VGGtiny conv+bn blocks
        return (0, _num_suffix(head, "block_"), _conv_then_bn(path[-1]))
    if head.startswith("conv_"):           # VGG19 plain convs
        return (0, _num_suffix(head, "conv_"), 0)
    raise KeyError(f"unknown backbone layer {'/'.join(path)}")


def lw_openpose_order(path: tuple) -> tuple:
    """models.openpose.LightWeightOpenPose (any supported backbone)."""
    top = path[0]
    if top == "backbone":
        return (0,) + _backbone_suborder(path[1:])
    if top == "cpm":
        sub = {"init": 0, "m0": 1, "m1": 2, "m2": 3, "end": 4}[path[1]]
        return (1, sub, _conv_then_bn(path[-1]))
    if top.startswith("init_m"):
        return (2, _num_suffix(top, "init_m"), 0)
    if top == "init_heads":
        return (3, {"conf1": 0, "conf2": 1, "paf1": 2, "paf2": 3}[path[1]])
    if top.startswith("ref_b"):
        n = _num_suffix(top, "ref_b")
        sub = {"init": 0, "c1": 1, "c2": 2}[path[1]]
        return (4, n, sub, _conv_then_bn(path[-1]))
    if top == "ref_heads":
        return (5, {"conf1": 0, "conf2": 1, "paf1": 2, "paf2": 3}[path[1]])
    raise KeyError(f"unknown LightWeightOpenPose layer {'/'.join(path)}")


def openpose_order(path: tuple) -> tuple:
    """models.openpose.OpenPose (CMU VGG19 arch)."""
    top = path[0]
    if top == "backbone":
        return (0,) + _backbone_suborder(path[1:])
    if top in ("cpm1", "cpm2"):
        return (1, 0 if top == "cpm1" else 1)
    # stages: init_conf/init_paf then refN_conf/refN_paf; the reference
    # builds each stage's conf block fully, then its paf block
    if top.startswith("init_"):
        stage, branch = 0, top[5:]
    elif top.startswith("ref"):
        n, branch = top[3:].split("_", 1)
        stage = 1 + int(n)
    else:
        raise KeyError(f"unknown OpenPose layer {'/'.join(path)}")
    b = {"conf": 0, "paf": 1}[branch]
    sub = path[1]
    li = 100 if sub == "out" else _num_suffix(sub, "l")
    leaf = {"conv": 0, "prelu": 1}[path[2]]
    return (2, stage, b, li, leaf)


ORDER_KEYS = {
    "LightweightOpenpose": lw_openpose_order,
    "Openpose": openpose_order,
}
