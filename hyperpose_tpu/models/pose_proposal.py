"""PoseProposal network in flax.linen (NHWC).

ResNet18(stride 32) + 2x(conv512+BN+leaky_relu) + 1x1 conv -> sigmoid, split
into per-part grid-cell detection maps and a limb edge-confidence tensor
(reference: hyperpose/Model/pose_proposal/model.py:37-168).
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from .backbones import ConvBN, Resnet18

Dtype = Any


class PoseProposal(nn.Module):
    """Outputs dict with grid maps (NHWC: [B, hout, wout, K]) and the edge
    tensor e [B, L, hnei, wnei, hout, wout]."""

    K: int = 18              # parts incl. Instance
    L: int = 17              # limbs
    hnei: int = 9
    wnei: int = 9
    hin: int = 384
    win: int = 384
    backbone: Callable[..., nn.Module] = Resnet18
    dtype: Dtype = jnp.float32
    lmd_rsp: float = 0.25    # loss weights (reference: config_ppn.py)
    lmd_iou: float = 1.0
    lmd_coor: float = 5.0
    lmd_size: float = 5.0
    lmd_limb: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, ret_backbone: bool = False):
        bf = self.backbone(scale_size=32, dtype=self.dtype, name="backbone")(
            x, train
        )
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        y = ConvBN(512, momentum=0.9, act=lrelu, use_bias=True,
                   dtype=self.dtype, name="add1")(bf, train)
        y = ConvBN(512, momentum=0.9, act=lrelu, use_bias=True,
                   dtype=self.dtype, name="add2")(y, train)
        out_dim = 6 * self.K + self.hnei * self.wnei * self.L
        y = nn.Conv(out_dim, (1, 1), dtype=self.dtype, name="head")(y)
        y = nn.sigmoid(y.astype(jnp.float32))

        b, hout, wout, _ = y.shape
        pc = y[..., 0:self.K]
        pi = y[..., self.K:2 * self.K]
        px = y[..., 2 * self.K:3 * self.K]
        py = y[..., 3 * self.K:4 * self.K]
        pw = y[..., 4 * self.K:5 * self.K]
        ph = y[..., 5 * self.K:6 * self.K]
        pe = y[..., 6 * self.K:]
        # [B, hout, wout, L*hnei*wnei] -> [B, L, hnei, wnei, hout, wout]
        pe = pe.reshape(b, hout, wout, self.L, self.hnei, self.wnei)
        pe = pe.transpose(0, 3, 4, 5, 1, 2)

        predict = {"c": pc, "i": pi, "x": px, "y": py, "w": pw, "h": ph,
                   "e": pe}
        if ret_backbone:
            predict["backbone_features"] = bf
        return predict

    def restore_coor(self, x, y, w, h, hout: int, wout: int):
        """Cell-relative -> input-pixel coordinates
        (reference: model.py:111-119). NHWC: maps are [B, hout, wout, K]."""
        gsx = self.win / wout
        gsy = self.hin / hout
        gx = jnp.arange(wout, dtype=jnp.float32).reshape(1, 1, wout, 1)
        gy = jnp.arange(hout, dtype=jnp.float32).reshape(1, hout, 1, 1)
        rx = (x + gx) * gsx
        ry = (y + gy) * gsy
        return rx, ry, w * self.win, h * self.hin


def _iou(b1, b2):
    """Center-format IoU (reference: model.py cal_iou)."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    ix = nn.relu(jnp.minimum(x1 + w1 / 2, x2 + w2 / 2)
                 - jnp.maximum(x1 - w1 / 2, x2 - w2 / 2))
    iy = nn.relu(jnp.minimum(y1 + h1 / 2, y2 + h2 / 2)
                 - jnp.maximum(y1 - h1 / 2, y2 - h2 / 2))
    inter = ix * iy
    union = w1 * h1 + w2 * h2 - inter + 1e-6
    return inter / union


def pose_proposal_loss(
    model: PoseProposal, predict: dict, target: dict, eps: float = 1e-6
) -> tuple[jnp.ndarray, dict]:
    """Lambda-weighted squared-error losses with gt-conditioned masks
    (reference: model.py:133-168 cal_loss)."""
    pc, px, py = predict["c"], predict["x"], predict["y"]
    pw, ph, pi, pe = predict["w"], predict["h"], predict["i"], predict["e"]
    gc, gx, gy = target["c"], target["x"], target["y"]
    gw, gh, ge, gem = target["w"], target["h"], target["e"], target["e_mask"]

    hout, wout = gc.shape[1], gc.shape[2]
    rg = model.restore_coor(gx, gy, gw, gh, hout, wout)
    rp = model.restore_coor(px, py, pw, ph, hout, wout)
    ti = _iou(rg, rp)

    mask_point = jnp.minimum(gc + jnp.where(gc < 0.5, 1e-5, 0.0), 1.0)
    mask_edge = jnp.minimum(gem + jnp.where(gem < 0.5, 1e-5, 0.0), 1.0)
    half = jnp.where(gc < 0.5, 0.5, 0.0)

    def msum(v, axes):
        return jnp.mean(jnp.sum(v, axis=axes))

    loss_rsp = model.lmd_rsp * msum((gc - pc) ** 2, (1, 2, 3))
    loss_iou = model.lmd_iou * msum(gc * (ti - pi) ** 2, (1, 2, 3))
    loss_coor = model.lmd_coor * msum(
        mask_point * ((gx - px - half) ** 2 + (gy - py - half) ** 2), (1, 2, 3)
    )
    loss_size = model.lmd_size * msum(
        mask_point * (
            (jnp.sqrt(gw + eps) - jnp.sqrt(pw + eps)) ** 2
            + (jnp.sqrt(gh + eps) - jnp.sqrt(ph + eps)) ** 2
        ),
        (1, 2, 3),
    )
    loss_limb = model.lmd_limb * msum(
        mask_edge * (ge - pe) ** 2, (1, 2, 3, 4, 5)
    )
    total = loss_rsp + loss_iou + loss_coor + loss_size + loss_limb
    return total, {
        "loss_rsp": loss_rsp, "loss_iou": loss_iou, "loss_coor": loss_coor,
        "loss_size": loss_size, "loss_limb": loss_limb,
    }
