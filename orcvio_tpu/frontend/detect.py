"""Shi-Tomasi corner detection with gridded spatial distribution.

TPU-native equivalent of the reference's masked ``goodFeaturesToTrack``
(image_processor.cpp:341,1015-1047): the min-eigenvalue score map is pure
convs/elementwise; the min-distance mask around existing features and the
spatial spread are realized with a grid — top-k scores per cell — which is
both static-shape and closer to how the filter wants features distributed
(cf. the reference's aug-grid, orcvio.cpp updateGridMap).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import _sep_conv, _GAUSS5, gradients


def shi_tomasi_score(img, window: int = 3):
    """Min eigenvalue of the structure tensor per pixel."""
    Ix, Iy = gradients(img)
    k = (1.0 / window,) * window  # static kernel (see image._sep_conv)
    Sxx = _sep_conv(Ix * Ix, k)
    Syy = _sep_conv(Iy * Iy, k)
    Sxy = _sep_conv(Ix * Iy, k)
    tr = Sxx + Syy
    det = Sxx * Syy - Sxy * Sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    return tr / 2 - disc


def _nms3(score):
    """3x3 non-maximum suppression."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def detect_grid(img, n_per_cell: int, grid_rows: int, grid_cols: int,
                occupied_xy=None, occupied_mask=None, min_distance: float = 20.0,
                quality: float = 0.01, border: int = 8):
    """Detect up to n_per_cell corners per grid cell, avoiding occupied areas.

    occupied_xy: (N, 2) existing feature pixel coords; detections within
    min_distance of one are suppressed (reference uses a painted mask,
    image_processor.cpp:1021-1042). Returns (xy (C*n, 2), score (C*n,),
    valid (C*n,)) with C = grid_rows * grid_cols.
    """
    H, W = img.shape
    score = shi_tomasi_score(img)
    score = _nms3(score)
    # border suppression
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    score = jnp.where(inb, score, 0.0)
    # occupied-area suppression: scatter occupied points into a binary map and
    # dilate by a (2r+1) square via two separable max reduce_windows — O(H*W)
    # instead of the O(N*H*W) per-feature distance tensor (a ~290 MB
    # intermediate at bench shapes). A square of half-width r contains the
    # reference's painted disc of radius r (image_processor.cpp:1021-1042);
    # slightly stronger suppression, same intent.
    if occupied_xy is not None:
        r = jnp.int32(min_distance)
        ix = jnp.clip(occupied_xy[:, 0].astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(occupied_xy[:, 1].astype(jnp.int32), 0, H - 1)
        occ = jnp.zeros((H, W), img.dtype).at[iy, ix].max(
            occupied_mask.astype(img.dtype), mode="drop"
        )
        k = 2 * int(min_distance) + 1
        occ = jax.lax.reduce_window(occ, -jnp.inf, jax.lax.max, (k, 1), (1, 1), "SAME")
        occ = jax.lax.reduce_window(occ, -jnp.inf, jax.lax.max, (1, k), (1, 1), "SAME")
        score = jnp.where(occ > 0, 0.0, score)

    thresh = quality * jnp.max(score)
    score = jnp.where(score > thresh, score, 0.0)

    ch = H // grid_rows
    cw = W // grid_cols
    cells = score[: ch * grid_rows, : cw * grid_cols].reshape(
        grid_rows, ch, grid_cols, cw
    ).transpose(0, 2, 1, 3).reshape(grid_rows * grid_cols, ch * cw)
    top_v, top_i = jax.lax.top_k(cells, n_per_cell)  # (C, n)
    cy = top_i // cw
    cx = top_i % cw
    gy = (jnp.arange(grid_rows * grid_cols) // grid_cols)[:, None] * ch + cy
    gx = (jnp.arange(grid_rows * grid_cols) % grid_cols)[:, None] * cw + cx
    xy = jnp.stack([gx, gy], axis=-1).reshape(-1, 2).astype(img.dtype)
    sc = top_v.reshape(-1)
    return xy, sc, sc > 0.0
