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

import numpy as np

_GAUSS5 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


@functools.lru_cache(maxsize=64)
def _band_matrix(n: int, kernel: tuple, stride: int = 1):
    """Banded 1D-convolution operator as a dense matrix constant.

    Single-channel 2D convs map poorly onto the MXU (C=1 starves the
    contraction); a separable filter is instead two small dense matmuls
    B_H @ img @ B_W^T. Edge padding is folded into the band weights, and
    stride-2 downsampling is just taking every other row of the operator.
    """
    B = np.zeros((n, n), np.float32)
    pad = len(kernel) // 2
    rows = np.arange(n)
    for o, w in enumerate(kernel):
        idx = np.clip(rows + o - pad, 0, n - 1)
        np.add.at(B, (rows, idx), w)
    return B[::stride]


def _sep_conv(img, k, stride: int = 1):
    """Separable 2D convolution with edge padding via banded matmuls.

    k must be a STATIC kernel (tuple / numpy array), not a traced value —
    it is baked into the banded operator constant.
    """
    H, W = img.shape
    kt = tuple(float(v) for v in np.asarray(k))
    BH = jnp.asarray(_band_matrix(H, kt, stride), img.dtype)
    BW = jnp.asarray(_band_matrix(W, kt, stride), img.dtype)
    with jax.default_matmul_precision("highest"):
        return BH @ img @ BW.T


def gaussian_blur(img):
    return _sep_conv(img, _GAUSS5)


def blur_downsample(img):
    """Gaussian blur fused with stride-2 downsample (half the FLOPs)."""
    return _sep_conv(img, _GAUSS5, stride=2)


def build_pyramid(img, levels: int):
    """[level0 (full res), level1 (half), ...]."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(blur_downsample(pyr[-1]))
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


@functools.lru_cache(maxsize=8)
def _poly_fit_matrix(bins: int, degree: int):
    """(degree+1, bins) least-squares operator: coef = M @ cdf."""
    x = np.linspace(0.0, 1.0, bins)
    V = np.stack([x**d for d in range(degree + 1)], axis=1)  # (bins, d+1)
    M = np.linalg.solve(V.T @ V, V.T)
    return M.astype(np.float32)


def equalize_hist(img, bins: int = 64, knots: int = 32, subsample: int = 4,
                  mode: str = "poly", degree: int = 8):
    """Global histogram equalization (stand-in for the reference's CLAHE).

    Gather/scatter-free AND cheap: jnp.histogram (scatter-add) and cdf[idx]
    (gather) both hit the TPU slow path. The histogram is accumulated over a
    `subsample`-strided pixel grid via fused one-hot compares (the CDF is a
    global statistic — striding adds ~0.3% sampling noise, invisible to
    tracking). Two apply modes for the monotone CDF map:

    * "poly" (default): fit a degree-`degree` polynomial to the CDF with a
      PRECOMPUTED least-squares operator (one (d+1, bins) matmul per frame)
      and apply by Horner — ~2(d+1) VPU ops/pixel instead of ~3*knots.
      Round-4 scan-protocol timing: the piecewise apply made equalize
      ~1.0 ms/frame, ~30% of the whole tracker; the polynomial apply is
      ~6x fewer elementwise ops. Max deviation vs the exact map is a few
      gray levels on smooth CDFs — KLT/ORB operate on local contrast and
      the accuracy ladder (bench ATE) gates the approximation.
    * "pwl": the exact piecewise-linear apply over `knots` segments.

    Defaults bins=64/subsample=4: the one-hot histogram build is the
    dominant cost (compares = H*W*bins/subsample^2); a 64-bin CDF over a
    4-strided grid changes the fitted map by <1 gray level on natural
    images while cutting the histogram work 16x vs 256/2.
    """
    flat = jnp.clip(img, 0.0, 255.0)
    sub = flat[::subsample, ::subsample]
    idx = jnp.clip(sub / 255.0 * (bins - 1), 0.0, bins - 1.0).round()
    levels = jnp.arange(bins, dtype=img.dtype)
    onehot = idx[..., None] == levels  # fused, never materialized
    hist = jnp.sum(onehot, axis=(0, 1), dtype=img.dtype)
    cdf = jnp.cumsum(hist)
    cdf = cdf / cdf[-1]
    if mode == "poly":
        M = jnp.asarray(_poly_fit_matrix(bins, degree), img.dtype)
        coef = M @ cdf  # (degree+1,)
        xn = flat * (1.0 / 255.0)
        out = coef[degree]
        for d in range(degree - 1, -1, -1):
            out = out * xn + coef[d]
        return jnp.clip(out, 0.0, 1.0) * 255.0
    # piecewise-linear apply: knot values of the CDF at equispaced gray
    # levels; per pixel, sum of hat-function contributions (VPU only)
    step = (bins - 1) / knots
    knot_pos = jnp.arange(knots + 1, dtype=img.dtype) * step
    knot_idx = jnp.clip(knot_pos.round(), 0, bins - 1).astype(jnp.int32)
    knot_val = jnp.sum(  # one-hot instead of a gather (even tiny gathers
        cdf * (knot_idx[:, None] == jnp.arange(bins)), axis=-1)  # loop on TPU)
    x = jnp.clip(flat / 255.0 * (bins - 1), 0.0, bins - 1.0)
    seg = x[..., None] / step - jnp.arange(knots, dtype=img.dtype)
    w_hi = jnp.clip(seg, 0.0, 1.0)  # (H, W, knots) — fused
    out = knot_val[0] + jnp.sum(w_hi * (knot_val[1:] - knot_val[:-1]), axis=-1)
    return out * 255.0


def clahe(img, grid=(8, 8), clip_limit: float = 3.0, bins: int = 256):
    """Contrast-limited adaptive histogram equalization (cv::CLAHE equivalent).

    The reference equalizes with cv::createCLAHE before tracking
    (image_processor.cpp:322, flag_equalize). Tiled clipped histograms ->
    per-tile CDF LUTs -> bilinear interpolation between the four neighboring
    tile LUTs per pixel. One scatter-add builds all tile histograms at once.
    """
    H, W = img.shape
    gh, gw = grid
    th = -(-H // gh)
    tw = -(-W // gw)
    Hp, Wp = th * gh, tw * gw
    x = jnp.pad(jnp.clip(img, 0.0, 255.0), ((0, Hp - H), (0, Wp - W)), mode="edge")

    b = jnp.clip((x / 255.0 * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    tile_r = jnp.arange(Hp)[:, None] // th
    tile_c = jnp.arange(Wp)[None, :] // tw
    tile_id = tile_r * gw + tile_c
    flat = (tile_id * bins + b).reshape(-1)
    hist = jnp.zeros((gh * gw * bins,), img.dtype).at[flat].add(1.0)
    hist = hist.reshape(gh * gw, bins)

    # clip + redistribute (single pass, the standard CLAHE approximation)
    n_pix = th * tw
    clip = clip_limit * n_pix / bins
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / bins

    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]
    lut = cdf * 255.0  # (n_tiles, bins)

    # bilinear interpolation between tile centers
    cy = (jnp.arange(Hp, dtype=img.dtype) - th / 2.0) / th
    cx = (jnp.arange(Wp, dtype=img.dtype) - tw / 2.0) / tw
    r0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, gh - 1)
    c0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, gw - 1)
    r1 = jnp.clip(r0 + 1, 0, gh - 1)
    c1 = jnp.clip(c0 + 1, 0, gw - 1)
    fy = jnp.clip(cy - r0, 0.0, 1.0)[:, None]
    fx = jnp.clip(cx - c0, 0.0, 1.0)[None, :]

    def look(rr, cc):
        tid = rr[:, None] * gw + cc[None, :]
        return lut[tid, b]

    out = (
        look(r0, c0) * (1 - fy) * (1 - fx)
        + look(r0, c1) * (1 - fy) * fx
        + look(r1, c0) * fy * (1 - fx)
        + look(r1, c1) * fy * fx
    )
    return out[:H, :W]
