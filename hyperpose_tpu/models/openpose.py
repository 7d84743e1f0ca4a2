"""OpenPose family models in flax.linen (NHWC).

Four architectures mirroring the reference's OpenPose algorithm family
(reference: hyperpose/Model/openpose/model/{openpose,lw_openpose,
mbv2_th_openpose,mbv2_sm_openpose}.py), each returning
{"conf_map", "paf_map", "stage_confs", "stage_pafs"} and optionally
backbone features for domain adaptation.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .backbones import (
    ConvBN, DepthwiseConv, MobilenetDilated, MobilenetSmall, MobilenetThin,
    Vgg19,
)

Dtype = Any


def prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


class PRelu(nn.Module):
    """Channel-wise PReLU (reference: tl.layers.PRelu used in openpose.py)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.0), (x.shape[-1],), jnp.float32
        )
        return prelu(x, alpha.astype(x.dtype))


class _ConvPRelu(nn.Module):
    features: int
    kernel: tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        return PRelu(dtype=self.dtype, name="prelu")(x)


class _CmuStage(nn.Module):
    """One CMU-OpenPose stage head: a conv+PReLU tower per branch
    (reference: openpose.py:119-199 Init_stage/Refinement_stage)."""

    n_out: int
    plan: Sequence[tuple[int, int]]  # (features, ksize) per layer
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (f, k) in enumerate(self.plan):
            x = _ConvPRelu(f, (k, k), dtype=self.dtype, name=f"l{i}")(x)
        return _ConvPRelu(self.n_out, (1, 1), dtype=self.dtype, name="out")(x)


class OpenPose(nn.Module):
    """Full CMU OpenPose: VGG19 + cpm convs + init stage + 5 refinement stages
    (reference: openpose/model/openpose.py:13-117)."""

    n_confmaps: int = 19
    n_pafmaps: int = 38
    num_channels: int = 128
    backbone: Callable[..., nn.Module] = Vgg19
    dtype: Dtype = jnp.float32
    n_refinements: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False, ret_backbone: bool = False):
        feats = self.backbone(
            scale_size=8, dtype=self.dtype, name="backbone"
        )(x, train)
        feats = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                                name="cpm1")(feats))
        feats = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                                name="cpm2")(feats))

        init_plan = [(128, 3), (128, 3), (128, 3), (512, 1)]
        ref_plan = [(128, 7)] * 5 + [(128, 1)]
        confs, pafs = [], []
        conf = _CmuStage(self.n_confmaps, init_plan, dtype=self.dtype,
                         name="init_conf")(feats)
        paf = _CmuStage(self.n_pafmaps, init_plan, dtype=self.dtype,
                        name="init_paf")(feats)
        confs.append(conf)
        pafs.append(paf)
        for i in range(self.n_refinements):
            z = jnp.concatenate([feats, confs[-1], pafs[-1]], axis=-1)
            conf = _CmuStage(self.n_confmaps, ref_plan, dtype=self.dtype,
                             name=f"ref{i}_conf")(z)
            paf = _CmuStage(self.n_pafmaps, ref_plan, dtype=self.dtype,
                            name=f"ref{i}_paf")(z)
            confs.append(conf)
            pafs.append(paf)
        out = {
            "conf_map": confs[-1], "paf_map": pafs[-1],
            "stage_confs": confs, "stage_pafs": pafs,
        }
        if ret_backbone:
            out["backbone_features"] = feats
        return out


class _LwConvBlock(nn.Module):
    """conv3x3 + BN(relu) (reference: lw_openpose.py:193-198 conv_block)."""

    features: int
    dilation: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.features, dilation=self.dilation, momentum=0.99,
                      dtype=self.dtype, name="cb")(x, train)


class _LwCpm(nn.Module):
    """Lightweight cpm: 1x1 conv + residual tower + end conv
    (reference: lw_openpose.py:106-121)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype,
                            name="init")(x))
        y = x
        for i in range(3):
            y = _LwConvBlock(self.features, dtype=self.dtype,
                             name=f"m{i}")(y, train)
        x = x + y
        return nn.relu(nn.Conv(self.features, (3, 3), padding="SAME",
                               dtype=self.dtype, name="end")(x))


class _LwHeads(nn.Module):
    """conf/paf prediction heads: 1x1 conv(512, relu) + 1x1 conv(out)
    (reference: lw_openpose.py:129-141)."""

    n_confmaps: int
    n_pafmaps: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = nn.relu(nn.Conv(512, (1, 1), dtype=self.dtype, name="conf1")(x))
        conf = nn.Conv(self.n_confmaps, (1, 1), dtype=self.dtype,
                       name="conf2")(c)
        p = nn.relu(nn.Conv(512, (1, 1), dtype=self.dtype, name="paf1")(x))
        paf = nn.Conv(self.n_pafmaps, (1, 1), dtype=self.dtype, name="paf2")(p)
        return conf, paf


class _LwRefineBlock(nn.Module):
    """1x1 conv + 2 conv-BN blocks with residual
    (reference: lw_openpose.py:180-191 Refinement_block)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype,
                            name="init")(x))
        y = _LwConvBlock(self.features, dtype=self.dtype, name="c1")(x, train)
        y = _LwConvBlock(self.features, dtype=self.dtype, name="c2")(y, train)
        return x + y


class LightWeightOpenPose(nn.Module):
    """Lightweight OpenPose: dilated-MobileNet + cpm + init + 1 refinement
    (reference: openpose/model/lw_openpose.py:12-104)."""

    n_confmaps: int = 19
    n_pafmaps: int = 38
    num_channels: int = 128
    backbone: Callable[..., nn.Module] = MobilenetDilated
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_backbone: bool = False):
        bf = self.backbone(scale_size=8, dtype=self.dtype, name="backbone")(
            x, train
        )
        feats = _LwCpm(self.num_channels, dtype=self.dtype, name="cpm")(
            bf, train
        )
        confs, pafs = [], []
        # Init stage: 3 conv(relu) then heads (lw_openpose.py:123-141).
        y = feats
        for i in range(3):
            y = nn.relu(nn.Conv(self.num_channels, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"init_m{i}")(y))
        conf, paf = _LwHeads(self.n_confmaps, self.n_pafmaps, dtype=self.dtype,
                             name="init_heads")(y)
        confs.append(conf)
        pafs.append(paf)
        # One refinement stage: 5 refine blocks + heads (lw_openpose.py:150-178).
        z = jnp.concatenate([feats, conf, paf], axis=-1)
        for i in range(5):
            z = _LwRefineBlock(self.num_channels, dtype=self.dtype,
                               name=f"ref_b{i}")(z, train)
        conf, paf = _LwHeads(self.n_confmaps, self.n_pafmaps, dtype=self.dtype,
                             name="ref_heads")(z)
        confs.append(conf)
        pafs.append(paf)
        out = {
            "conf_map": confs[-1], "paf_map": pafs[-1],
            "stage_confs": confs, "stage_pafs": pafs,
        }
        if ret_backbone:
            out["backbone_features"] = bf
        return out


class _SepBNBlock(nn.Module):
    """dw conv + BN(act) + 1x1 conv + BN(act) — the thin variant's stage
    head block (reference: mbv2_th_openpose.py:171-178 separable_block:
    DepthwiseConv2d, BatchNorm2d(act), Conv2d(1x1, b_init=None),
    BatchNorm2d(act); act applies to BOTH norms, None for the output
    block)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DepthwiseConv(kernel=self.kernel, dtype=self.dtype, name="dw")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         use_fast_variance=False, momentum=0.99,
                         dtype=self.dtype, name="bn1")(x)
        if self.act is not None:
            x = self.act(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         use_fast_variance=False, momentum=0.99,
                         dtype=self.dtype, name="bn2")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SeparableConv(nn.Module):
    """Single-layer separable conv (dw + 1x1 pw + bias) — one
    tl.layers.SeparableConv2d (reference: mbv2_sm_openpose.py:166-170).
    Parameters live under ONE module path ({dw_kernel, pw_kernel, bias})
    mirroring the single TL layer, so structural checkpoint import aligns
    1:1. The small stage block wraps this with a BatchNorm
    (_SepSmallBlock)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        cin = x.shape[-1]
        kh, kw = self.kernel
        dw = self.param("dw_kernel", nn.initializers.lecun_normal(),
                        (kh, kw, 1, cin), jnp.float32)
        pw = self.param("pw_kernel", nn.initializers.lecun_normal(),
                        (1, 1, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        x = lax.conv_general_dilated(
            x, dw.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cin,
        )
        x = lax.conv_general_dilated(
            x, pw.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + b.astype(x.dtype)
        if self.act is not None:
            x = self.act(x)
        return x


class _SepSmallBlock(nn.Module):
    """Small-variant stage block: SeparableConv2d(act) followed by
    BatchNorm2d(decay=0.999, act) — the activation runs twice (once inside
    the separable conv, once after BN), exactly as the reference builds it
    (mbv2_sm_openpose.py:166-171 separable_block). Serializes as sepconv
    {dw_kernel, pw_kernel, bias} + bn {scale, bias, mean, var}, matching
    real reference checkpoints layer for layer."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv(self.features, self.kernel, act=self.act,
                          dtype=self.dtype, name="sep")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         use_fast_variance=False, momentum=0.999,
                         dtype=self.dtype, name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class _SepStage(nn.Module):
    """Separable-conv stage head. style="thin": dw+BN+pw+BN blocks
    (mbv2_th_openpose.py:106-162); style="small": SeparableConv+BN blocks
    (mbv2_sm_openpose.py:103-157,166-171)."""

    n_out: int
    plan: Sequence[tuple[int, int]]
    style: str = "thin"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, k) in enumerate(self.plan):
            if self.style == "thin":
                x = _SepBNBlock(f, (k, k), dtype=self.dtype,
                                name=f"l{i}")(x, train)
            else:
                x = _SepSmallBlock(f, (k, k), dtype=self.dtype,
                                   name=f"l{i}")(x, train)
        if self.style == "thin":
            return _SepBNBlock(self.n_out, (1, 1), act=None, dtype=self.dtype,
                               name="out")(x, train)
        return _SepSmallBlock(self.n_out, (1, 1), act=None, dtype=self.dtype,
                              name="out")(x, train)


class _ThinSmallOpenPose(nn.Module):
    """Shared structure of the thin/small variants: backbone + separable stage
    heads iterated n_stages times."""

    n_confmaps: int
    n_pafmaps: int
    backbone: Callable[..., nn.Module]
    n_refinements: int
    init_plan: Sequence[tuple[int, int]]
    ref_plan: Sequence[tuple[int, int]]
    style: str = "thin"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_backbone: bool = False):
        feats = self.backbone(
            scale_size=8, dtype=self.dtype, name="backbone"
        )(x, train)
        confs, pafs = [], []
        conf = _SepStage(self.n_confmaps, self.init_plan, style=self.style,
                         dtype=self.dtype, name="init_conf")(feats, train)
        paf = _SepStage(self.n_pafmaps, self.init_plan, style=self.style,
                        dtype=self.dtype, name="init_paf")(feats, train)
        confs.append(conf)
        pafs.append(paf)
        for i in range(self.n_refinements):
            z = jnp.concatenate([feats, confs[-1], pafs[-1]], axis=-1)
            conf = _SepStage(self.n_confmaps, self.ref_plan, style=self.style,
                             dtype=self.dtype, name=f"ref{i}_conf")(z, train)
            paf = _SepStage(self.n_pafmaps, self.ref_plan, style=self.style,
                            dtype=self.dtype, name=f"ref{i}_paf")(z, train)
            confs.append(conf)
            pafs.append(paf)
        out = {
            "conf_map": confs[-1], "paf_map": pafs[-1],
            "stage_confs": confs, "stage_pafs": pafs,
        }
        if ret_backbone:
            out["backbone_features"] = feats
        return out


def MobilenetThinOpenpose(
    n_confmaps: int = 19, n_pafmaps: int = 38, dtype: Dtype = jnp.float32,
    backbone: Callable[..., nn.Module] | None = None, **_: Any,
) -> _ThinSmallOpenPose:
    """(reference: openpose/model/mbv2_th_openpose.py:14-162): thin backbone,
    5 refinement stages, separable heads with 7x7-free init / 3x3 plans."""
    return _ThinSmallOpenPose(
        n_confmaps=n_confmaps, n_pafmaps=n_pafmaps,
        backbone=backbone or MobilenetThin, n_refinements=5,
        init_plan=[(128, 3), (128, 3), (128, 3), (512, 1)],
        ref_plan=[(128, 3), (128, 3), (128, 3), (128, 1)],
        style="thin", dtype=dtype,
    )


def MobilenetSmallOpenpose(
    n_confmaps: int = 19, n_pafmaps: int = 38, dtype: Dtype = jnp.float32,
    backbone: Callable[..., nn.Module] | None = None, **_: Any,
) -> _ThinSmallOpenPose:
    """(reference: openpose/model/mbv2_sm_openpose.py:14-158): small backbone,
    4 refinement stages, 7x7 separable refine plans."""
    return _ThinSmallOpenPose(
        n_confmaps=n_confmaps, n_pafmaps=n_pafmaps,
        backbone=backbone or MobilenetSmall, n_refinements=4,
        init_plan=[(128, 3), (128, 3), (128, 3), (512, 1)],
        ref_plan=[(128, 7), (128, 7), (128, 7), (128, 1)],
        style="small", dtype=dtype,
    )


def openpose_loss(
    predict: dict, gt_conf: jnp.ndarray, gt_paf: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Staged L2 loss, mean over stages, / batch
    (reference: openpose/model/openpose.py:89-117 cal_loss;
    tf.nn.l2_loss(x) == sum(x^2) / 2).

    mask: optional [B, H, W, 1] array, 1 where loss applies (crowd masking,
    reference: openpose/processor.py:24-32).
    """
    batch = gt_conf.shape[0]
    m = 1.0 if mask is None else mask
    stage_losses = []
    conf_losses, paf_losses = [], []
    for conf, paf in zip(predict["stage_confs"], predict["stage_pafs"]):
        lc = 0.5 * jnp.sum(jnp.square((gt_conf - conf.astype(jnp.float32)) * m))
        lp = 0.5 * jnp.sum(jnp.square((gt_paf - paf.astype(jnp.float32)) * m))
        stage_losses += [lc, lp]
        conf_losses.append(lc)
        paf_losses.append(lp)
    pd_loss = jnp.mean(jnp.stack(stage_losses)) / batch
    return pd_loss, {
        "conf_loss": conf_losses[-1] / batch,
        "paf_loss": paf_losses[-1] / batch,
    }
