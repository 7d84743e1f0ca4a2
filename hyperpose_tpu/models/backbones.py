"""Backbone zoo in flax.linen, NHWC, TPU-native.

Provides the same 10 backbone families as the reference
(reference: hyperpose/Model/backbones.py:9,63,201,250,299,343,393,447,512,587)
with the uniform contract: ctor knobs (scale_size in {8, 32}, pretraining),
an `out_channels` class attribute, and `__call__(x, train)` returning NHWC
feature maps (or logits when `pretraining=True`).

All convs run in the compute dtype (bfloat16 on TPU by default via
`dtype`), with parameters kept in float32.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + activation."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    act: Callable | None = nn.relu
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            kernel_dilation=self.dilation, padding="SAME",
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)
        # use_fast_variance=False everywhere: the E[x^2]-E[x]^2 form loses
        # ~1e-3 relative precision under sharded batch reductions (and worse
        # in bf16), which breaks sharded-vs-single-device parity checks.
        x = nn.BatchNorm(
            use_running_average=not train, use_fast_variance=False,
            momentum=self.momentum,
            epsilon=self.epsilon, dtype=self.dtype, name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseConv(nn.Module):
    """Depthwise 2D conv (feature_group_count = in_channels)."""

    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(
            c, self.kernel, strides=self.strides, kernel_dilation=self.dilation,
            padding="SAME", feature_group_count=c, use_bias=self.use_bias,
            dtype=self.dtype, name="dwconv",
        )(x)


class SeparableBlock(nn.Module):
    """Depthwise conv + BN + act, then 1x1 conv + BN + act
    (reference: backbones.py:241-248 separable_block)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    act: Callable = nn.relu
    momentum: float = 0.99
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DepthwiseConv(
            strides=self.strides, dilation=self.dilation, dtype=self.dtype,
            name="dw",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, use_fast_variance=False, momentum=self.momentum,
            dtype=self.dtype, name="bn1",
        )(x)
        x = self.act(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pw",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, use_fast_variance=False, momentum=self.momentum,
            dtype=self.dtype, name="bn2",
        )(x)
        return self.act(x)


def _classifier_head(x, hidden: Sequence[int], dtype) -> jnp.ndarray:
    x = x.reshape((x.shape[0], -1))
    for i, h in enumerate(hidden):
        x = nn.relu(nn.Dense(h, dtype=dtype, name=f"fc{i + 1}")(x))
    return nn.Dense(1000, dtype=dtype, name="fc_out")(x)


class VggTiny(nn.Module):
    """TinyVGG: conv-BN stacks 32-64 / 128-128 / 200x3 / 384x2 with 3 pools
    (reference: backbones.py:343-391). The north-star inference backbone."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 384

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [(32, 1), (64, 1), "pool", (128, 1), (128, 1), "pool",
               (200, 1), (200, 1), (200, 1), "pool", (384, 1), (384, 1)]
        i = 0
        for item in cfg:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, s = item
                x = ConvBN(
                    f, strides=(s, s), dtype=self.dtype, name=f"block_{i}",
                )(x, train)
                i += 1
        if self.scale_size == 32 or self.pretraining:
            for j, s in enumerate([2, 1, 2]):
                x = ConvBN(
                    384, strides=(s, s), dtype=self.dtype, name=f"block_s32_{j}",
                )(x, train)
        if self.pretraining:
            x = _classifier_head(x, [4096, 4096], self.dtype)
        return x


class VggTinyS2DStem(nn.Module):
    """EXACT space-to-depth serving form of VggTiny.

    VggTiny's first two stride-1 convs run at full input resolution with
    3->32->64 channels, leaving the 128-lane MXU mostly idle. This variant
    computes the IDENTICAL function on the 2x2-packed half-resolution grid:

      - input packed 2x2 -> channels (H, W, 3) -> (H/2, W/2, 12),
      - block_0/block_1 convs become 3x3 packed convs producing all four
        output phases as channel groups (kernels remapped EXACTLY from the
        original 3x3 kernels by phase decomposition; see
        remap_vggtiny_to_s2d),
      - per-phase BatchNorm (original params tiled 4x),
      - the first 2x2/2 maxpool collapses to a max over the 4 phase groups
        (full-res windows align exactly with packed positions),

    after which block_2.. proceed unchanged at the same resolution/values
    as VggTiny post-pool. Use remap_vggtiny_to_s2d(variables) to convert
    any trained/imported VggTiny checkpoint; outputs match to float
    roundoff. (No reference counterpart — TPU-native serving transform.)
    """

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 384

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # phase-packed twins of block_0 (32ch) and block_1 (64ch)
        x = ConvBN(4 * 32, dtype=self.dtype, name="s2d_0")(x, train)
        x = ConvBN(4 * 64, dtype=self.dtype, name="s2d_1")(x, train)
        # first maxpool == max over the 4 phase groups
        bb, hh, ww, _ = x.shape
        x = x.reshape(bb, hh, ww, 4, 64).max(axis=3)
        cfg = [(128, 1), (128, 1), "pool", (200, 1), (200, 1), (200, 1),
               "pool", (384, 1), (384, 1)]
        i = 2  # block numbering continues VggTiny's
        for item in cfg:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, s = item
                x = ConvBN(
                    f, strides=(s, s), dtype=self.dtype, name=f"block_{i}",
                )(x, train)
                i += 1
        if self.scale_size == 32 or self.pretraining:
            for j, s in enumerate([2, 1, 2]):
                x = ConvBN(
                    384, strides=(s, s), dtype=self.dtype,
                    name=f"block_s32_{j}",
                )(x, train)
        if self.pretraining:
            x = _classifier_head(x, [4096, 4096], self.dtype)
        return x


def _phase_pack_kernel(k: np.ndarray, in_phases: int) -> np.ndarray:
    """Phase-decompose a full-resolution 3x3 stride-1 SAME conv kernel
    [3, 3, Cin, Cout] into the equivalent 3x3 conv on the 2x2-packed grid:
    [3, 3, 4*Cin, 4*Cout] (in_phases=4) or [3, 3, Cin*4-packed-raw, ...].

    Packed channel layout matches VggTinyS2DStem's reshape:
    channel = (phase_y * 2 + phase_x) * C + c.

    Derivation: full-res output position p = 2q + d (phase d in {0,1}^2);
    out(p) = sum_u k[u+1] in(2q + d + u); write d + u = 2s + e with
    s = floor((d+u)/2) in {-1,0,1} and phase e — tap s+1 of a 3x3 packed
    kernel reading input phase e. SAME padding on the packed grid zeroes
    exactly the taps full-res SAME padding zeroes (even H/W).
    """
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((3, 3, 4 * cin, 4 * cout), k.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            for uy in (-1, 0, 1):
                for ux in (-1, 0, 1):
                    sy, ey = divmod(dy + uy, 2)
                    sx, ex = divmod(dx + ux, 2)
                    out[sy + 1, sx + 1,
                        (ey * 2 + ex) * cin:(ey * 2 + ex + 1) * cin,
                        (dy * 2 + dx) * cout:(dy * 2 + dx + 1) * cout] \
                        += k[uy + 1, ux + 1]
    return out


def _tile_phases(v: np.ndarray) -> np.ndarray:
    """Per-channel BN param [C] -> per-phase-packed [4*C]."""
    return np.tile(np.asarray(v), 4)


def remap_vggtiny_to_s2d(variables: dict) -> dict:
    """Convert VggTiny variables (trained or imported) into
    VggTinyS2DStem variables computing the identical function.

    Works on full model trees whose backbone subtree is VggTiny (e.g.
    LightWeightOpenPose): only backbone/block_0 and backbone/block_1 are
    transformed; every other leaf passes through unchanged.
    """
    import jax

    def conv_params(blk):
        return np.asarray(blk["conv"]["kernel"])

    out = jax.tree.map(lambda x: x, variables)  # shallow-ish copy
    params = dict(out["params"])
    bb = dict(params["backbone"])
    stats = dict(out.get("batch_stats", {}))
    bstats = dict(stats.get("backbone", {}))

    for i, cin_phases in ((0, 3), (1, 32)):
        blk = bb.pop(f"block_{i}")
        k = conv_params(blk)
        s2d = {
            "conv": {"kernel": _phase_pack_kernel(k, 4)},
            "bn": {
                "scale": _tile_phases(blk["bn"]["scale"]),
                "bias": _tile_phases(blk["bn"]["bias"]),
            },
        }
        bb[f"s2d_{i}"] = s2d
        if f"block_{i}" in bstats:
            bs = bstats.pop(f"block_{i}")
            bstats[f"s2d_{i}"] = {"bn": {
                "mean": _tile_phases(bs["bn"]["mean"]),
                "var": _tile_phases(bs["bn"]["var"]),
            }}
    params["backbone"] = bb
    out["params"] = params
    if bstats:
        stats["backbone"] = bstats
        out["batch_stats"] = stats
    return out


class VggTinyFusedStem(nn.Module):
    """EXACT serving form of VggTiny with the stem (block_0, block_1, pool1)
    replaced by a packed XLA conv + the fused Pallas conv+pool kernel
    (ops.pallas.stem_kernel) so the full-resolution activations never touch
    HBM. Inference only (BatchNorm is folded); convert any VggTiny
    checkpoint with remap_vggtiny_to_fused(variables) — outputs match to
    float roundoff. blocks 2.. are identical to VggTiny.

    conv0p computes block_0 on the 2-pixel-packed image: input
    (B, H, W/2, 6) [pair-packed RGB], output (B, H, W/2, 128) holding
    block_0's 32 channels at x = 2q+off for off in {-1, 0, 1, 2} — i.e.
    the x-direction im2col the fused kernel consumes, emitted directly so
    the Pallas kernel performs no data rearrangement. Each full-res
    position is computed twice (block_0 is 0.4% of the net's FLOPs); its
    (3,3,6,128) kernel is the phase decomposition of block_0's (3,3,3,32)
    (see remap_vggtiny_to_fused).
    """

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 384
    interpret: bool = False  # pallas interpret mode (CPU tests)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.pallas.stem_kernel import fused_conv1_pool

        if train or self.pretraining:
            raise NotImplementedError(
                "VggTinyFusedStem is a serving-only transform; train with "
                "VggTiny and remap_vggtiny_to_fused the checkpoint"
            )
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(
                f"VggTinyFusedStem needs even input height and width (the "
                f"width-pair packing and 2x2 pool assume it); got {h}x{w} — "
                "pad the input or use VggTiny, which accepts any size"
            )
        xp = x.reshape(b, h, w // 2, 2 * c)
        a0p = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                              name="conv0p")(xp))
        w1p = self.param("w1p", nn.initializers.zeros, (3, 128, 128),
                         jnp.float32)
        b1p = self.param("b1p", nn.initializers.zeros, (128,), jnp.float32)
        x = fused_conv1_pool(a0p, w1p.astype(self.dtype), b1p,
                             interpret=self.interpret)
        cfg = [(128, 1), (128, 1), "pool", (200, 1), (200, 1), (200, 1),
               "pool", (384, 1), (384, 1)]
        i = 2  # block numbering continues VggTiny's
        for item in cfg:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, s = item
                x = ConvBN(
                    f, strides=(s, s), dtype=self.dtype, name=f"block_{i}",
                )(x, train)
                i += 1
        if self.scale_size == 32:
            for j, s in enumerate([2, 1, 2]):
                x = ConvBN(
                    384, strides=(s, s), dtype=self.dtype,
                    name=f"block_s32_{j}",
                )(x, train)
        return x


def _fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold inference BatchNorm into conv kernel + bias."""
    s = np.asarray(bn_scale) / np.sqrt(np.asarray(bn_var) + eps)
    return (np.asarray(kernel, np.float32) * s,
            np.asarray(bn_bias) - np.asarray(bn_mean) * s)


def remap_vggtiny_to_fused(variables: dict) -> dict:
    """Convert VggTiny variables (trained or imported, full model trees
    included) into VggTinyFusedStem variables computing the identical
    function at inference.

    block_0 (conv+BN) -> conv0p: W0p[dy, kq, 3*px+ci, 32*(off+1)+co] =
    W0fold[dy, dx+1, ci, co] at dx = 2*(kq-1)+px-off when |dx| <= 1, else 0
    (x_in = 2*(q+kq-1)+px, x_out = 2*q+off for off in {-1, 0, 1, 2}: the
    output lanes are the x-im2col the fused kernel reads directly).

    block_1 (conv+BN) -> (w1p, b1p) for the fused kernel: per dy, the
    128x128 matrix reading the kernel's bt lane layout
    [x=2q-1: ci | x=2q: ci | x=2q+1: ci | x=2q+2: ci] and writing
    [x=2q: co | x=2q+1: co]; W1p[dy][32*(off+1)+...] = W1fold[dy, dx+1,
    ci, co] with dx = off - p for off in {-1, 0, 1, 2}.
    """
    import jax

    def bn_of(name, params_bb, stats_bb):
        blk, bst = params_bb[name], stats_bb[name]
        return (np.asarray(blk["conv"]["kernel"]), blk["bn"]["scale"],
                blk["bn"]["bias"], bst["bn"]["mean"], bst["bn"]["var"])

    out = jax.tree.map(lambda x: x, variables)
    params = dict(out["params"])
    bb = dict(params["backbone"])
    stats = dict(out.get("batch_stats", {}))
    bstats = dict(stats.get("backbone", {}))

    w0f, b0f = _fold_bn(*bn_of("block_0", bb, bstats))     # (3,3,3,32),(32,)
    w1f, b1f = _fold_bn(*bn_of("block_1", bb, bstats))     # (3,3,32,64),(64,)

    w0p = np.zeros((3, 3, 6, 128), np.float32)
    for kq in range(3):
        for px in range(2):
            for off in (-1, 0, 1, 2):
                dx = 2 * (kq - 1) + px - off
                if abs(dx) <= 1:
                    lo = 32 * (off + 1)
                    w0p[:, kq, 3 * px: 3 * px + 3, lo: lo + 32] = \
                        w0f[:, dx + 1]
    b0p = np.tile(b0f, 4)

    w1p = np.zeros((3, 128, 128), np.float32)
    for off in (-1, 0, 1, 2):
        for p in range(2):
            dx = off - p
            if abs(dx) <= 1:
                w1p[:, 32 * (off + 1): 32 * (off + 1) + 32,
                    64 * p: 64 * p + 64] = w1f[:, dx + 1]
    b1p = np.tile(b1f, 2)

    for name in ("block_0", "block_1"):
        bb.pop(name)
        bstats.pop(name, None)
    bb["conv0p"] = {"kernel": w0p, "bias": b0p}
    bb["w1p"] = w1p
    bb["b1p"] = b1p
    params["backbone"] = bb
    out["params"] = params
    if bstats:
        stats["backbone"] = bstats
        out["batch_stats"] = stats
    elif "backbone" in stats:
        del stats["backbone"]
        out["batch_stats"] = stats
    return out


class VggTinyS2D(nn.Module):
    """TPU-native TinyVGG variant: a space-to-depth stem.

    The faithful TinyVGG spends most of its time in 32/64-channel convs at
    full input resolution, where the 128-lane MXU runs mostly empty. This
    variant rearranges each 2x2 input patch into channels (368x432x3 ->
    184x216x12) and starts at 64 channels/half resolution, keeping the
    same total stride (8), receptive-field class and output channels —
    ~1.5x faster on TPU at equal capacity. No reference counterpart; train
    from scratch (reference TinyVGG weights do not transfer)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 384

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        cfg = [(64, 1), (64, 1), "pool", (128, 1), (128, 1),
               (200, 1), (200, 1), (200, 1), "pool", (384, 1), (384, 1)]
        i = 0
        for item in cfg:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, s = item
                x = ConvBN(
                    f, strides=(s, s), dtype=self.dtype, name=f"block_{i}",
                )(x, train)
                i += 1
        if self.scale_size == 32 or self.pretraining:
            for j, s in enumerate([2, 1, 2]):
                x = ConvBN(
                    384, strides=(s, s), dtype=self.dtype,
                    name=f"block_s32_{j}",
                )(x, train)
        if self.pretraining:
            x = _classifier_head(x, [4096, 4096], self.dtype)
        return x


class Vgg16(nn.Module):
    """VGG16 conv trunk (reference: backbones.py:393-445); plain convs, no BN."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [(64, 2), "pool", (128, 2), "pool", (256, 3), "pool", (512, 3)]
        b = 0
        for item in cfg:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, n = item
                for _ in range(n):
                    x = nn.relu(nn.Conv(
                        f, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{b}",
                    )(x))
                    b += 1
        if self.scale_size == 32 or self.pretraining:
            x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            for _ in range(3):
                x = nn.relu(nn.Conv(
                    512, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv_{b}",
                )(x))
                b += 1
            x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
        if self.pretraining:
            x = _classifier_head(x, [4096, 4096], self.dtype)
        return x


class Vgg19(nn.Module):
    """VGG19 trunk up to conv4_2 at stride 8 with BGR mean subtraction
    (reference: backbones.py:447-510)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Mean subtraction (BGR means / 255, reference backbones.py:454).
        mean = jnp.asarray(
            np.array([103.939, 116.779, 123.68], np.float32) / 255.0,
            self.dtype,
        )
        x = x - mean
        cfg = [(64, 2), "pool", (128, 2), "pool", (256, 4), "pool", (512, 2)]
        b = 0
        for item in cfg:
            if item == "pool":
                x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            else:
                f, n = item
                for _ in range(n):
                    x = nn.relu(nn.Conv(
                        f, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{b}",
                    )(x))
                    b += 1
        if self.scale_size == 32 or self.pretraining:
            for _ in range(2):
                x = nn.relu(nn.Conv(
                    512, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv_{b}",
                )(x))
                b += 1
            x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
            for _ in range(4):
                x = nn.relu(nn.Conv(
                    512, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv_{b}",
                )(x))
                b += 1
            x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
        if self.pretraining:
            x = _classifier_head(x, [4096, 4096], self.dtype)
        return x


class MobilenetV1(nn.Module):
    """MobileNetV1 trunk (reference: backbones.py:9-61)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return 1024 if (self.scale_size == 32 or self.pretraining) else 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(32, strides=(2, 2), dtype=self.dtype, name="stem")(x, train)
        plan = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                (512, 1), (512, 1), (512, 1), (512, 1)]
        if self.scale_size == 32 or self.pretraining:
            plan += [(512, 2), (512, 1), (1024, 2), (1024, 1)]
        for i, (f, s) in enumerate(plan):
            x = SeparableBlock(
                f, strides=(s, s), dtype=self.dtype, name=f"sep_{i}",
            )(x, train)
        if self.pretraining:
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(1000, dtype=self.dtype, name="fc_out")(x)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (reference: backbones.py:139-176)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    exp_ratio: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.exp_ratio
        identity = self.strides == (1, 1) and inp == self.features
        y = x
        if self.exp_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.BatchNorm(use_running_average=not train, use_fast_variance=False, dtype=self.dtype,
                             name="bn0")(y)
            y = nn.relu6(y)
        y = DepthwiseConv(strides=self.strides, dtype=self.dtype, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, use_fast_variance=False, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, use_fast_variance=False, dtype=self.dtype,
                         name="bn2")(y)
        return x + y if identity else y


class MobilenetV2(nn.Module):
    """MobileNetV2 trunk (reference: backbones.py:63-137)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return 320 if (self.scale_size == 32 or self.pretraining) else 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(32, strides=(2, 2), act=nn.relu6, dtype=self.dtype,
                   name="stem")(x, train)
        plan = [(16, 1, 1), (24, 2, 6), (24, 1, 6), (32, 2, 6), (32, 1, 6),
                (32, 1, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6)]
        if self.scale_size == 32 or self.pretraining:
            plan += [(96, 2, 6), (96, 1, 6), (96, 1, 6),
                     (160, 2, 6), (160, 1, 6), (160, 1, 6), (320, 1, 6)]
        for i, (f, s, e) in enumerate(plan):
            x = InvertedResidual(
                f, strides=(s, s), exp_ratio=e, dtype=self.dtype,
                name=f"ir_{i}",
            )(x, train)
        if self.pretraining:
            x = nn.Conv(1280, (1, 1), dtype=self.dtype, name="head_conv")(x)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(1000, dtype=self.dtype, name="fc_out")(x)
        return x


class MobilenetDilated(nn.Module):
    """Dilated MobileNetV1 at stride 8 — the Lightweight-OpenPose backbone
    (reference: backbones.py:201-232)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (2, 2) if (self.scale_size == 32 or self.pretraining) else (1, 1)
        x = ConvBN(32, strides=(2, 2), momentum=0.999, dtype=self.dtype,
                   name="stem")(x, train)
        plan = [
            (64, (1, 1), (1, 1)), (128, (2, 2), (1, 1)), (128, (1, 1), (1, 1)),
            (256, (2, 2), (1, 1)), (256, (1, 1), (1, 1)), (512, (1, 1), (1, 1)),
            (512, s, (2, 2)), (512, (1, 1), (1, 1)), (512, s, (1, 1)),
            (512, (1, 1), (1, 1)), (512, (1, 1), (1, 1)),
        ]
        for i, (f, st, dil) in enumerate(plan):
            x = SeparableBlock(
                f, strides=st, dilation=dil, dtype=self.dtype, name=f"sep_{i}",
            )(x, train)
        return x


class MobilenetThin(nn.Module):
    """MobileNet-Thin with multi-scale concat features, out 1152 channels
    (reference: backbones.py:250-297)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 1152

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (2, 2) if (self.scale_size == 32 or self.pretraining) else (1, 1)
        x = ConvBN(32, strides=(2, 2), dtype=self.dtype, name="stem")(x, train)
        plan = [(64, (1, 1)), (128, (2, 2)), (128, (1, 1)), (256, (2, 2)),
                (256, (1, 1)), (512, s), (512, (1, 1)), (512, (1, 1)),
                (512, s), (512, (1, 1)), (512, (1, 1))]
        feats = []
        for i, (f, st) in enumerate(plan):
            x = SeparableBlock(f, strides=st, dtype=self.dtype,
                               name=f"sep_{i}")(x, train)
            if i == 2:  # after convblock_3
                feats.append(nn.max_pool(x, (2, 2), (2, 2), padding="SAME"))
            elif i == 6:  # after convblock_7
                feats.append(x)
        feats.append(x)
        return jnp.concatenate(feats, axis=-1)


class MobilenetSmall(nn.Module):
    """MobileNet-Small with pooled/upsampled concat, out 704 channels
    (reference: backbones.py:299-341)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 704

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (2, 2) if (self.scale_size == 32 or self.pretraining) else (1, 1)
        x = ConvBN(32, strides=(2, 2), dtype=self.dtype, name="stem")(x, train)
        x = SeparableBlock(64, dtype=self.dtype, name="sep_0")(x, train)
        feats = [nn.max_pool(x, (2, 2), (2, 2), padding="SAME")]
        x = SeparableBlock(128, strides=(2, 2), dtype=self.dtype,
                           name="sep_1")(x, train)
        x = SeparableBlock(128, dtype=self.dtype, name="sep_2")(x, train)
        feats.append(x)
        x = SeparableBlock(256, strides=(2, 2), dtype=self.dtype,
                           name="sep_3")(x, train)
        x = SeparableBlock(256, dtype=self.dtype, name="sep_4")(x, train)
        x = SeparableBlock(512, strides=s, dtype=self.dtype, name="sep_5")(x, train)
        x = SeparableBlock(512, strides=s, dtype=self.dtype, name="sep_6")(x, train)
        b, h, w, c = x.shape
        x = jax_resize_nearest(x, (h * 2, w * 2))
        feats.append(x)
        return jnp.concatenate(feats, axis=-1)


def jax_resize_nearest(x, out_hw):
    import jax

    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="nearest")


class ResBlock18(nn.Module):
    """ResNet18 basic block (reference: backbones.py:563-586)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    down_sample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = ConvBN(self.features, strides=self.strides, momentum=0.9,
                   dtype=self.dtype, name="cb1")(x, train)
        y = ConvBN(self.features, act=None, momentum=0.9, dtype=self.dtype,
                   name="cb2")(y, train)
        if self.down_sample:
            res = ConvBN(self.features, kernel=(1, 1), strides=self.strides,
                         act=None, momentum=0.9, dtype=self.dtype,
                         name="ds")(res, train)
        return nn.relu(y + res)


class Resnet18(nn.Module):
    """ResNet18 trunk ending at block_5_1 (reference: backbones.py:512-561)."""

    scale_size: int = 8
    pretraining: bool = False
    dtype: Dtype = jnp.float32
    out_channels: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (2, 2) if (self.scale_size == 32 or self.pretraining) else (1, 1)
        x = ConvBN(64, kernel=(7, 7), strides=(2, 2), momentum=0.9,
                   dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        x = ResBlock18(64, dtype=self.dtype, name="b2_1")(x, train)
        x = ResBlock18(64, dtype=self.dtype, name="b2_2")(x, train)
        x = ResBlock18(128, strides=(2, 2), down_sample=True,
                       dtype=self.dtype, name="b3_1")(x, train)
        x = ResBlock18(128, dtype=self.dtype, name="b3_2")(x, train)
        x = ResBlock18(256, strides=s, down_sample=True,
                       dtype=self.dtype, name="b4_1")(x, train)
        x = ResBlock18(256, dtype=self.dtype, name="b4_2")(x, train)
        x = ResBlock18(512, strides=s, down_sample=True,
                       dtype=self.dtype, name="b5_1")(x, train)
        if self.pretraining:
            x = ResBlock18(512, dtype=self.dtype, name="b5_2")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(1000, dtype=self.dtype, name="fc_out")(x)
        return x


class Bottleneck(nn.Module):
    """ResNet50 bottleneck block (reference: backbones.py:652-697)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        res = x
        y = ConvBN(self.features, kernel=(1, 1), momentum=0.9,
                   dtype=self.dtype, name="cb1")(x, train)
        y = ConvBN(self.features, strides=self.strides, momentum=0.9,
                   dtype=self.dtype, name="cb2")(y, train)
        y = ConvBN(4 * self.features, kernel=(1, 1), act=None, momentum=0.9,
                   dtype=self.dtype, name="cb3")(y, train)
        if self.strides != (1, 1) or inp != 4 * self.features:
            res = ConvBN(4 * self.features, kernel=(1, 1), strides=self.strides,
                         act=None, momentum=0.9, dtype=self.dtype,
                         name="ds")(res, train)
        return nn.relu(y + res)


class Resnet50(nn.Module):
    """ResNet50 trunk (reference: backbones.py:587-650). `use_pool=False`
    yields the stride-16 variant used by PifPaf (pifpaf/model.py:40-42)."""

    scale_size: int = 8
    pretraining: bool = False
    use_pool: bool = True
    dtype: Dtype = jnp.float32
    out_channels: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = (2, 2) if (self.scale_size == 32 or self.pretraining) else (1, 1)
        x = ConvBN(64, kernel=(7, 7), strides=(2, 2), momentum=0.9,
                   dtype=self.dtype, name="stem")(x, train)
        if self.use_pool:
            x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        plan = [(64, (1, 1), 3), (128, (2, 2), 4), (256, s, 6), (512, s, 3)]
        for gi, (f, st, n) in enumerate(plan):
            for bi in range(n):
                x = Bottleneck(
                    f, strides=st if bi == 0 else (1, 1), dtype=self.dtype,
                    name=f"b{gi + 1}_{bi + 1}",
                )(x, train)
        if self.pretraining:
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(1000, dtype=self.dtype, name="fc_out")(x)
        return x


# Registry keyed by the reference's BACKBONE enum names
# (reference: Config/define.py:3-15).
BACKBONES: dict[str, type[nn.Module]] = {
    "Mobilenetv1": MobilenetV1,
    "Mobilenetv2": MobilenetV2,
    "MobilenetDilated": MobilenetDilated,
    "MobilenetThin": MobilenetThin,
    "MobilenetSmall": MobilenetSmall,
    "Vggtiny": VggTiny,
    # TPU-native extension (no reference counterpart):
    "VggtinyS2D": VggTinyS2D,
    "Vgg19": Vgg19,
    "Vgg16": Vgg16,
    "Resnet18": Resnet18,
    "Resnet50": Resnet50,
}
