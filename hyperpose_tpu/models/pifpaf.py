"""PifPaf (composite fields) model in flax.linen, NHWC.

ResNet50 without the stem max-pool (stride 16) + 1x1 conv heads with 2x
pixel shuffle -> composite CIF ([P] conf/vec/logb/scale) and CAF ([L] conf/
src+dst vec/logb/scale) fields (reference: hyperpose/Model/pifpaf/model.py).

Map layout (NHWC-native):
  pif_conf  [B, H, W, P]     pif_vec  [B, H, W, P, 2]
  pif_bmin  [B, H, W, P]     pif_scale [B, H, W, P]   (logb during training)
  paf_*     same with L limb fields and src/dst pairs.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .backbones import Resnet50

Dtype = Any


def pixel_shuffle_nhwc(x: jax.Array, scale: int = 2) -> jax.Array:
    """[B, H, W, C*s^2] -> [B, H*s, W*s, C] (reference: pifpaf/utils.py:371-379)."""
    b, h, w, c = x.shape
    oc = c // (scale * scale)
    x = x.reshape(b, h, w, scale, scale, oc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * scale, w * scale, oc)


class Pifpaf(nn.Module):
    """Outputs raw (pre-activation) composite fields; `infer` semantics
    (sigmoid conf, softplus scale) are applied by the decoder."""

    n_pos: int = 17
    n_limbs: int = 19
    hin: int = 368
    win: int = 432
    quad_size: int = 2
    backbone: Callable[..., nn.Module] | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_backbone: bool = False):
        # ImageNet normalization (reference: model.py:38-39,56).
        mean = jnp.asarray(np.array([0.485, 0.456, 0.406], np.float32), self.dtype)
        std = jnp.asarray(np.array([0.229, 0.224, 0.225], np.float32), self.dtype)
        x = (x - mean) / std
        # ResNet50 at scale 32 with the stem max-pool removed => stride 16
        # trunk; the 2x pixel shuffle brings the fields to stride 8
        # (reference: model.py:41-46).
        if self.backbone is None:
            bf = Resnet50(
                scale_size=32, use_pool=False, dtype=self.dtype,
                name="backbone",
            )(x, train)
        else:
            bf = self.backbone(
                scale_size=32, dtype=self.dtype, name="backbone"
            )(x, train)
        q2 = self.quad_size ** 2
        pif = nn.Conv(self.n_pos * 5 * q2, (1, 1), dtype=self.dtype,
                      name="pif_head")(bf)
        paf = nn.Conv(self.n_limbs * 9 * q2, (1, 1), dtype=self.dtype,
                      name="paf_head")(bf)
        pif = pixel_shuffle_nhwc(pif.astype(jnp.float32), self.quad_size)
        paf = pixel_shuffle_nhwc(paf.astype(jnp.float32), self.quad_size)
        b, h, w, _ = pif.shape
        pif = pif.reshape(b, h, w, self.n_pos, 5)
        paf = paf.reshape(b, h, w, self.n_limbs, 9)

        predict = {
            "pif_conf": pif[..., 0],
            "pif_vec": pif[..., 1:3],
            "pif_bmin": pif[..., 3],      # logb during training
            "pif_scale": pif[..., 4],
            "paf_conf": paf[..., 0],
            "paf_src_vec": paf[..., 1:3],
            "paf_dst_vec": paf[..., 3:5],
            "paf_src_bmin": paf[..., 5],
            "paf_dst_bmin": paf[..., 6],
            "paf_src_scale": paf[..., 7],
            "paf_dst_scale": paf[..., 8],
        }
        if ret_backbone:
            predict["backbone_features"] = bf
        return predict


def soft_clamp(x, max_value: float = 5.0):
    """log-soften values above max_value (reference: model.py:95-100)."""
    return jnp.where(
        x >= max_value, max_value + jnp.log1p(jnp.maximum(x - max_value, 0.0)), x
    )


def bce_loss(pd_conf, gt_conf, focal_gamma: float = 1.0):
    """NaN-masked focal BCE (reference: model.py:101-120 Bce_loss)."""
    batch = pd_conf.shape[0]
    valid = ~jnp.isnan(gt_conf)
    gt = jnp.where(valid, gt_conf, 0.0)
    z = jnp.clip(pd_conf, -30, 30)
    bce = jnp.maximum(z, 0) - z * gt + jnp.log1p(jnp.exp(-jnp.abs(z)))
    bce = soft_clamp(bce)
    if focal_gamma != 0.0:
        p = jax.nn.sigmoid(z)
        pt = p * gt + (1 - p) * (1 - gt)
        focal = 1.0 - pt
        if focal_gamma != 1.0:
            focal = (focal + 1e-4) ** focal_gamma
        bce = focal * bce * 0.5
    return jnp.sum(jnp.where(valid, bce, 0.0)) / batch


def laplace_loss(pd_vec, pd_logb, gt_vec, gt_bmin):
    """NaN-masked Laplace regression (reference: model.py:122-146)."""
    batch = pd_vec.shape[0]
    valid = ~jnp.isnan(gt_vec[..., 0])
    gvx = jnp.where(valid, gt_vec[..., 0], 0.0)
    gvy = jnp.where(valid, gt_vec[..., 1], 0.0)
    gbm = jnp.where(valid, jnp.nan_to_num(gt_bmin), 0.0)
    norm = jnp.sqrt(
        (pd_vec[..., 0] - gvx) ** 2 + (pd_vec[..., 1] - gvy) ** 2 + gbm**2
    )
    logb = 3.0 * jnp.tanh(pd_logb / 3.0)
    scaled = soft_clamp(norm * jnp.exp(-logb))
    loss = logb + scaled
    return jnp.sum(jnp.where(valid, loss, 0.0)) / batch


def scale_loss(pd_scale, gt_scale):
    """NaN-masked relative L1 on softplus scales (reference: model.py:148-159)."""
    batch = pd_scale.shape[0]
    valid = ~jnp.isnan(gt_scale)
    gt = jnp.where(valid, gt_scale, 0.0)
    pd = jax.nn.softplus(pd_scale)
    loss = soft_clamp(jnp.abs(pd - gt) / (10.0 * (0.1 + gt)))
    return jnp.sum(jnp.where(valid, loss, 0.0)) / batch


def pifpaf_loss(predict: dict, target: dict) -> tuple[jnp.ndarray, dict]:
    """Total composite-field loss (reference: model.py:161-224 cal_loss;
    all lambdas default 1)."""
    parts = {
        "loss_pif_conf": bce_loss(predict["pif_conf"], target["pif_conf"]),
        "loss_pif_vec": laplace_loss(
            predict["pif_vec"], predict["pif_bmin"],
            target["pif_vec"], target["pif_bmin"],
        ),
        "loss_pif_scale": scale_loss(predict["pif_scale"], target["pif_scale"]),
        "loss_paf_conf": bce_loss(predict["paf_conf"], target["paf_conf"]),
        "loss_paf_src_vec": laplace_loss(
            predict["paf_src_vec"], predict["paf_src_bmin"],
            target["paf_src_vec"], target["paf_src_bmin"],
        ),
        "loss_paf_dst_vec": laplace_loss(
            predict["paf_dst_vec"], predict["paf_dst_bmin"],
            target["paf_dst_vec"], target["paf_dst_bmin"],
        ),
        "loss_paf_src_scale": scale_loss(
            predict["paf_src_scale"], target["paf_src_scale"]
        ),
        "loss_paf_dst_scale": scale_loss(
            predict["paf_dst_scale"], target["paf_dst_scale"]
        ),
    }
    total = sum(parts.values())
    return total, parts
