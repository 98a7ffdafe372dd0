"""Pyramidal Lucas-Kanade feature tracking, batched over features.

TPU-native equivalent of the reference's cv::calcOpticalFlowPyrLK calls
(image_processor.cpp:568,628 forward + reverse with 1px consistency): the
per-feature patch solves are one vmapped computation — bilinear patch gathers,
a 2x2 normal-equation solve per iteration, ``lax.scan`` over iterations,
python loop over (static) pyramid levels, coarse-to-fine.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample, gradients


class KltResult(NamedTuple):
    xy: jnp.ndarray  # (N, 2) tracked positions (level-0 pixels)
    ok: jnp.ndarray  # (N,) converged & in-bounds & residual sane


def _patch_offsets(patch: int, dtype):
    r = (patch - 1) / 2.0
    o = jnp.linspace(-r, r, patch).astype(dtype)
    oy, ox = jnp.meshgrid(o, o, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=1)  # (P^2, 2)


def track_level(img0, img1, xy0, xy1_init, patch: int, iters: int, eps: float):
    """One pyramid level of LK for all features.

    xy0: (N, 2) positions in img0; xy1_init: initial guesses in img1.
    Returns (xy1, residual, converged).
    """
    dtype = img0.dtype
    offs = _patch_offsets(patch, dtype)  # (P, 2)
    Ix, Iy = gradients(img0)

    def per_feature(p0, p1_init):
        pts0 = p0[None, :] + offs
        t = bilinear_sample(img0, pts0)  # template (P,)
        gx = bilinear_sample(Ix, pts0)
        gy = bilinear_sample(Iy, pts0)
        # 2x2 structure matrix (constant per feature at this level)
        A = jnp.stack(
            [
                jnp.stack([jnp.sum(gx * gx), jnp.sum(gx * gy)]),
                jnp.stack([jnp.sum(gx * gy), jnp.sum(gy * gy)]),
            ]
        )
        det_ok = jnp.linalg.det(A) > 1e-6
        A_safe = jnp.where(det_ok, A, jnp.eye(2, dtype=dtype))

        def it(carry, _):
            p1, _r = carry
            cur = bilinear_sample(img1, p1[None, :] + offs)
            err = cur - t
            b = jnp.stack([jnp.sum(gx * err), jnp.sum(gy * err)])
            d = jnp.linalg.solve(A_safe, b)
            p1_new = p1 - d
            return (p1_new, jnp.linalg.norm(d)), None

        (p1, dnorm), _ = jax.lax.scan(it, (p1_init, jnp.asarray(jnp.inf, dtype)), None, length=iters)
        cur = bilinear_sample(img1, p1[None, :] + offs)
        res = jnp.mean(jnp.abs(cur - t))
        return p1, res, det_ok & (dnorm < 1.0)

    return jax.vmap(per_feature)(xy0, xy1_init)


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
