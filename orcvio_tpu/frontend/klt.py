"""Pyramidal Lucas-Kanade feature tracking, batched over features.

TPU-native equivalent of the reference's cv::calcOpticalFlowPyrLK calls
(image_processor.cpp:568,628 forward + reverse with 1px consistency).

Design note (why no gathers): a direct port samples ~10M scattered pixels per
frame through gather ops, which lower to XLA's slow path on TPU (measured
660 ms/frame). Instead, every patch read is a per-feature integer-origin
WINDOW COPY (ops/window_extract.py — a zero-FLOP Pallas VMEM slice kernel on
TPU, `lax.dynamic_slice` on CPU) followed by a tiny in-window bilinear
resample expressed as separable one-hot matmuls over the (Wd, Wd) window:
a patch at subpixel center c is  W_y(c) @ win @ W_x(c)^T  where W_y is
(P, Wd) with two bilinear-weighted nonzeros per row. The LK iterations run
entirely inside the per-feature search window extracted once per level, so
each iteration is a tiny batched matmul. Same math as the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window_extract import padded_windows
from .image import gradients


class KltResult(NamedTuple):
    xy: jnp.ndarray  # (N, 2) tracked positions (level-0 pixels)
    ok: jnp.ndarray  # (N,) converged & in-bounds & residual sane


def _axis_weights(coord, size, taps):
    """Bilinear one-hot weights: (N,) subpixel coords + (P,) integer taps
    -> (N, P, size) with w[n, i, k] = bilinear weight of pixel k for
    coordinate coord[n] + taps[i]. Clamps to the valid range (edge padding),
    matching bilinear_sample's clip semantics."""
    dtype = coord.dtype
    c = coord[:, None] + taps[None, :].astype(dtype)  # (N, P)
    c = jnp.clip(c, 0.0, size - 1.001)
    c0 = jnp.floor(c)
    f = (c - c0)[..., None]
    k = jnp.arange(size, dtype=dtype)[None, None, :]
    is0 = (k == c0[..., None]).astype(dtype)
    is1 = (k == (c0[..., None] + 1.0)).astype(dtype)
    return is0 * (1.0 - f) + is1 * f


def extract_patches(img, centers, taps):
    """Bilinear patches at subpixel centers: window copy + local resample.

    img: (H, W); centers: (N, 2) xy; taps: (P,) integer offsets (concrete).
    Returns (N, P, P) patches (row index = y tap, col index = x tap).
    """
    taps = np.asarray(taps)  # static offsets — keep them out of the trace
    P = int(taps.shape[0])
    t0 = int(taps[0])
    Wd = P + 1  # one extra row/col for the bilinear upper tap
    win, origin = padded_windows(img[None], centers, t0, Wd)
    return _local_sample(win[0], centers - origin, taps)


def _local_sample(windows, local_xy, taps):
    """Bilinear patch resample inside small per-feature windows.

    windows: (N, Wy, Wx) — possibly taller than the logical window
    (tiling-padded rows hold valid pixels); local_xy: (N, 2) window-frame
    center. Returns (N, P, P). Small batched matmuls — negligible FLOPs.
    """
    Wy, Wx = windows.shape[-2:]
    wy = _axis_weights(local_xy[:, 1], Wy, taps)  # (N, P, Wy)
    wx = _axis_weights(local_xy[:, 0], Wx, taps)
    with jax.default_matmul_precision("highest"):
        rows = jnp.einsum("npw,nwv->npv", wy, windows)  # (N, P, Wd)
        return jnp.einsum("npv,nqv->npq", rows, wx)


def track_level(img0, img1, xy0, xy1_init, patch: int, iters: int, eps: float,
                search_radius: int = 9):
    """One pyramid level of LK for all features (batched, gather-free).

    xy0: (N, 2) positions in img0; xy1_init: initial guesses in img1.
    Returns (xy1, residual, converged). Iterates that leave the per-feature
    search window are clamped and flagged unconverged (the reference's LK
    similarly fails features whose flow exceeds the window).
    """
    dtype = img0.dtype
    H, W = img0.shape
    r = (patch - 1) // 2
    taps = np.arange(-r, r + 1)
    Ix, Iy = gradients(img0)

    # template + gradient patches at p0: one 3-channel window copy, then
    # three tiny in-window resamples at the shared subpixel center
    big = jnp.stack([img0, Ix, Iy])  # (3, H, W)
    Wt = patch + 1
    wins0, origin0 = padded_windows(big, xy0, -r, Wt)  # (3, N, Wt, Wt)
    local0 = xy0 - origin0
    ext = jax.vmap(lambda w: _local_sample(w, local0, taps))(wins0)
    t, gx, gy = ext[0], ext[1], ext[2]  # (N, P, P)

    a11 = jnp.sum(gx * gx, axis=(1, 2))
    a12 = jnp.sum(gx * gy, axis=(1, 2))
    a22 = jnp.sum(gy * gy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    det_ok = det > 1e-6
    det_safe = jnp.where(det_ok, det, 1.0)

    # integer search windows in img1 around the initial guess
    Wd = patch + 2 * search_radius + 2  # +2: bilinear needs one extra col/row
    c_int = jnp.round(xy1_init)
    wins1, origin = padded_windows(img1[None], c_int, -(Wd // 2), Wd)
    windows = wins1[0]  # (N, Wd, Wd)
    lo = jnp.asarray(0.0, dtype)
    hi = jnp.asarray(Wd - 1.001, dtype)

    def it(carry, _):
        p1, _ = carry
        local = p1 - origin
        local = jnp.clip(local, lo + r, hi - r)
        cur = _local_sample(windows, local, taps)
        err = cur - t
        b1 = jnp.sum(gx * err, axis=(1, 2))
        b2 = jnp.sum(gy * err, axis=(1, 2))
        dx = (a22 * b1 - a12 * b2) / det_safe
        dy = (a11 * b2 - a12 * b1) / det_safe
        d = jnp.stack([dx, dy], axis=1)
        p1n = origin + jnp.clip(local - d, lo + r, hi - r)
        return (p1n, jnp.linalg.norm(d, axis=1)), None

    # Unrolled: `iters` is <= ~10 and each body is tiny batched matmuls, so a
    # lax.scan/while costs more in per-iteration loop overhead (~25 us/step
    # device-side) than the math itself; unrolling lets XLA fuse across
    # iterations (measured ~5 ms -> ~1 ms for the 8 level-passes per frame).
    carry = (xy1_init, jnp.full((xy0.shape[0],), jnp.inf, dtype))
    for _ in range(iters):
        carry, _ = it(carry, None)
    p1, dnorm = carry
    cur = _local_sample(windows, p1 - origin, taps)
    res = jnp.mean(jnp.abs(cur - t), axis=(1, 2))
    # interior check: iterate not pinned to the window clamp boundary
    local = p1 - origin
    inside = (local > lo + r) & (local < hi - r)
    conv = det_ok & (dnorm < 1.0) & inside.all(axis=1)
    return p1, res, conv


def pyr_track(pyr0, pyr1, xy0, xy1_guess, patch: int = 15, iters: int = 10,
              max_residual: float = 25.0):
    """Coarse-to-fine LK over pyramids (lists, level 0 = full res)."""
    levels = len(pyr0)
    dtype = pyr0[0].dtype
    xy0 = jnp.asarray(xy0, dtype)
    scale = 2.0 ** (levels - 1)
    p1 = jnp.asarray(xy1_guess, dtype) / scale
    for lv in range(levels - 1, -1, -1):
        s = 2.0**lv
        p0_lv = xy0 / s
        if lv != levels - 1:
            p1 = p1 * 2.0
        p1, res, conv = track_level(pyr0[lv], pyr1[lv], p0_lv, p1, patch, iters, 0.01)
    xy1 = p1  # level 0
    H, W = pyr0[0].shape
    inb = (
        (xy1[:, 0] > 2) & (xy1[:, 0] < W - 3) & (xy1[:, 1] > 2) & (xy1[:, 1] < H - 3)
    )
    return KltResult(xy=xy1, ok=conv & inb & (res < max_residual))


def forward_backward_track(pyr0, pyr1, xy0, xy1_guess, patch: int = 15,
                           iters: int = 10, fb_thresh: float = 1.0):
    """Forward + reverse LK with consistency gate (image_processor.cpp:628-652)."""
    fwd = pyr_track(pyr0, pyr1, xy0, xy1_guess, patch, iters)
    bwd = pyr_track(pyr1, pyr0, fwd.xy, xy0, patch, iters)
    fb = jnp.linalg.norm(bwd.xy - xy0, axis=1)
    ok = fwd.ok & bwd.ok & (fb < fb_thresh)
    return KltResult(xy=fwd.xy, ok=ok)
