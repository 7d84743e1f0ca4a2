"""XLA image ops shared by the decoders and pipelines.

These replace the reference's OpenCV calls (reference: src/post_process.hpp:27-102
resize_area/smooth/same_max_pool_3x3, src/data.cpp:53-69 non_scaling_resize)
with fused, batched XLA computations that run on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def resize_nhwc(x: jax.Array, out_hw: tuple[int, int], method: str = "bilinear") -> jax.Array:
    """Resize a [B, H, W, C] tensor to out_hw.

    For upscaling, 'bilinear' matches cv2.INTER_AREA-on-upscale /
    tf.image.resize_area closely enough for decode parity
    (reference: src/post_process.hpp:27-53).
    """
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method=method)


@functools.lru_cache(maxsize=32)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    # Matches cv2.getGaussianKernel: symmetric, normalized to sum 1.
    half = (ksize - 1) / 2.0
    xs = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth_nhwc(x: jax.Array, ksize: int = 17, sigma: float = 3.0) -> jax.Array:
    """Depthwise separable Gaussian blur on [B, H, W, C].

    Reflect-101 padding to match cv2.GaussianBlur's default border mode
    (reference: src/post_process.hpp:56-70 `smooth`, sigma=3).
    """
    if ksize <= 1:
        return x
    c = x.shape[-1]
    k1d = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 1, c), ("NHWC", "HWIO", "NHWC"))

    # Vertical pass.
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    kv = jnp.tile(k1d.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    x = lax.conv_general_dilated(
        xp, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    # Horizontal pass.
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    kh = jnp.tile(k1d.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    return lax.conv_general_dilated(
        xp, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c,
    )


def same_max_pool_3x3_nhwc(x: jax.Array) -> jax.Array:
    """3x3 stride-1 same-padding max pool (reference: src/post_process.hpp:73-102,
    src/cudnn_kernel_pool.hpp:9-62)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )


def letterbox_resize(
    image: np.ndarray, target_hw: tuple[int, int]
) -> tuple[np.ndarray, float, float]:
    """Aspect-preserving resize onto a black canvas (host-side, cv2).

    Returns (canvas, ratio_x, ratio_y) where ratio_* is the fraction of the
    canvas covered by content (reference: src/data.cpp:53-69 non_scaling_resize,
    include/hyperpose/utility/human.hpp:44-58 resume_ratio).
    """
    import cv2

    th, tw = target_hw
    h, w = image.shape[:2]
    scale = min(tw / w, th / h)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    resized = cv2.resize(image, (nw, nh))
    canvas = np.zeros((th, tw, image.shape[2]), dtype=image.dtype)
    canvas[:nh, :nw] = resized
    return canvas, nw / tw, nh / th


def yuv420_to_rgb(yuv_u8: jax.Array) -> jax.Array:
    """Planar I420 [B, H*3/2, W] uint8 -> RGB float32 [B, H, W, 3] in 0..255.

    Device-side half of the compressed infeed path: the host ships video
    frames as 4:2:0 YUV (1.5 bytes/px — half the bytes of RGB8) and the
    chip reconstructs RGB fused into the normalize step. Matches
    cv2.COLOR_YUV2RGB_I420 (video-range BT.601, nearest chroma upsample)
    to within 0.5/255. The reference instead ships full BGR frames to the
    GPU every batch (reference: src/data.cpp:21-51
    nhwc_images_append_nchw_batch, src/tensorrt.cpp:364-434 H2D copy).
    """
    b, h15, w = yuv_u8.shape
    h = (h15 * 2) // 3
    if h % 2 or w % 2:
        raise ValueError(f"I420 needs even H,W; got {h}x{w}")
    f = yuv_u8.astype(jnp.float32)
    y = f[:, :h, :]
    u = f[:, h:h + h // 4, :].reshape(b, h // 2, w // 2)
    v = f[:, h + h // 4:, :].reshape(b, h // 2, w // 2)
    # Nearest 2x chroma upsample (matches cv2's I420 reconstruction).
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    yv = 1.164 * (y - 16.0)
    r = yv + 1.596 * v
    g = yv - 0.813 * v - 0.391 * u
    bch = yv + 2.018 * u
    return jnp.clip(jnp.stack([r, g, bch], axis=-1), 0.0, 255.0)


def rgb_to_yuv420(rgb_u8: np.ndarray) -> np.ndarray:
    """Host-side RGB [H,W,3] uint8 -> planar I420 [H*3/2, W] uint8 (cv2,
    with a numpy fallback). The producer half of the compressed infeed."""
    try:
        import cv2

        return cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2YUV_I420)
    except Exception:
        h, w = rgb_u8.shape[:2]
        f = rgb_u8.astype(np.float32)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.257 * r + 0.504 * g + 0.098 * b + 16.0
        u = -0.148 * r - 0.291 * g + 0.439 * b + 128.0
        v = 0.439 * r - 0.368 * g - 0.071 * b + 128.0
        out = np.empty((h * 3 // 2, w), np.uint8)
        out[:h] = np.clip(y + 0.5, 0, 255).astype(np.uint8)
        # cv2 subsamples chroma at the top-left pixel of each 2x2 block.
        u2 = u[0::2, 0::2]
        v2 = v[0::2, 0::2]
        out[h:h + h // 4] = np.clip(u2 + 0.5, 0, 255).astype(
            np.uint8).reshape(h // 4, w)
        out[h + h // 4:] = np.clip(v2 + 0.5, 0, 255).astype(
            np.uint8).reshape(h // 4, w)
        return out
