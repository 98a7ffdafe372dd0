"""Image primitives: pyramid, gradients, bilinear sampling, equalization.

TPU-native building blocks for the front end (reference:
``createImagePyramids`` image_processor.cpp:322 uses CLAHE +
buildOpticalFlowPyramid): separable Gaussian blur + stride-2 downsample as
XLA convs, bilinear gather for patch sampling (the core of LK), and a global
histogram-equalization approximation of CLAHE (flag-gated, as the reference's
``flag_equalize``).

Images are float32 (H, W) in [0, 255].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_GAUSS5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_conv(img, k):
    """Separable 2D convolution with reflect padding, (H, W) x (k,)."""
    pad = k.shape[0] // 2
    x = img[None, None]  # NCHW
    kh = k.reshape(1, 1, -1, 1).astype(img.dtype)
    kw = k.reshape(1, 1, 1, -1).astype(img.dtype)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="edge")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]


def gaussian_blur(img):
    return _sep_conv(img, _GAUSS5)


def build_pyramid(img, levels: int):
    """[level0 (full res), level1 (half), ...]."""
    pyr = [img]
    for _ in range(levels - 1):
        blurred = gaussian_blur(pyr[-1])
        pyr.append(blurred[::2, ::2])
    return pyr


def gradients(img):
    """Scharr-style central-difference gradients (Ix, Iy)."""
    kx = jnp.asarray([[-1.0, 0.0, 1.0]]) * 0.5
    gx = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    Ix = gx[:, 2:] * 0.5 - gx[:, :-2] * 0.5
    gy = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    Iy = gy[2:, :] * 0.5 - gy[:-2, :] * 0.5
    return Ix, Iy


def bilinear_sample(img, xy):
    """Sample img at subpixel locations xy (..., 2) = (x, y). Out-of-bounds clamped."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def sample_patch(img, center_xy, offsets):
    """Bilinear patch around center: offsets (P, 2) -> values (P,)."""
    return bilinear_sample(img, center_xy[None, :] + offsets)


def equalize_hist(img, bins: int = 256):
    """Global histogram equalization (stand-in for the reference's CLAHE)."""
    flat = jnp.clip(img, 0.0, 255.0)
    hist = jnp.histogram(flat, bins=bins, range=(0.0, 255.0))[0]
    cdf = jnp.cumsum(hist).astype(img.dtype)
    cdf = cdf / cdf[-1]
    idx = jnp.clip((flat / 255.0 * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    return cdf[idx] * 255.0
