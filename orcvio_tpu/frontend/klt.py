"""Pyramidal Lucas-Kanade feature tracking, batched over features.

TPU-native equivalent of the reference's cv::calcOpticalFlowPyrLK calls
(image_processor.cpp:568,628 forward + reverse with 1px consistency).

Design (round-5 revision; see git history for the round-3 matmul-gather
rationale this supersedes):
 * Window reads: XLA lowers batched gathers / vmapped dynamic_slice on TPU
   to a SEQUENTIAL while loop over slices (~170 us per 200-feature
   extraction, round-2's wall). Round 3 replaced them with one-hot
   block-select matmuls; round 5 replaces those with direct DMA copies
   (ops/dma_gather.py, via gather_windows impl="dma"): exact f32, single
   pass, zero MXU FLOPs — the matmul gathers' MXU work scaled with the
   replay batch and capped batched serving.
 * Each pyramid level runs as ONE Pallas kernel (ops/lk_pallas.py
   lk_level_fused): template extraction (a single (P+2) patch resample of
   the img0 window with in-patch central differences — equal to resampling
   precomputed gradient arrays by linearity) + all LK iterations over the
   img1 window. In-kernel subpixel selection contracts 0/1 bf16 one-hots
   against an explicit hi/lo bf16 split of the pixels (exact to ~2^-8 gray,
   two single-pass MXU dots — vs 6 passes for an f32 HIGHEST dot), with
   both integer selections applied to raw pixels and the fractional 2-D
   lerp last in f32. The XLA `resample` below remains as the CPU reference
   path and for the ORB/detect patch reads.
 * The backward consistency pass shares the forward pass's windows and runs
   at level 0 only: the backward track starts from the forward result whose
   flow is within the level-0 search radius by construction, so a full
   reverse pyramid adds cost but no discrimination (ladder-verified).

The LK math itself (template Hessian, clamped iterations, convergence and
residual gates) matches the reference's semantics.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window_gather import (
    AlignedImage, _use_matmul_impl, crop_lanes, gather_impl, gather_windows,
    prepare_image,
)


def _use_pallas_lk() -> bool:
    forced = os.environ.get("ORCVIO_KLT_IMPL", "")
    if forced:
        return forced == "pallas"
    return jax.default_backend() == "tpu"

SEARCH_WD = 36       # logical search-window span (patch 15 + 2*9 radius + 2)
ROWS, LANES = 48, 128  # physical (cropped) per-feature window


class KltResult(NamedTuple):
    xy: jnp.ndarray  # (N, 2) tracked positions (level-0 pixels)
    ok: jnp.ndarray  # (N,) converged & in-bounds & residual sane


class LevelWindows(NamedTuple):
    win: jnp.ndarray     # (N, ROWS, LANES) f32 pixels
    origin: jnp.ndarray  # (N, 2) xy of win[:, 0, 0] in image coords
    start: jnp.ndarray   # (N, 2) xy of the logical search window start


def prepare_pyramid(pyr, precision: str = "f32x2"):
    """Prepare each pyramid level for window gathering (once per frame)."""
    return tuple(prepare_image(img[None], margin=40, precision=precision)
                 for img in pyr)


def _mm_exact(a_onehot_bf16, x_f32, dims):
    """one-hot(bf16) x f32 contraction, exact via hi/lo bf16 splitting."""
    hi = x_f32.astype(jnp.bfloat16)
    lo = (x_f32 - hi.astype(x_f32.dtype)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(a_onehot_bf16, hi, dims,
                              preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(a_onehot_bf16, lo, dims,
                                     preferred_element_type=jnp.float32)


def _mm_bf16(a_onehot_bf16, x_f32, dims):
    return jax.lax.dot_general(a_onehot_bf16, x_f32.astype(jnp.bfloat16), dims,
                               preferred_element_type=jnp.float32)


def _onehot(idx, size, taps_n):
    """(N, taps_n, size) bf16 one-hot: [n, p, k] = (k == idx[n] + p)."""
    k = jnp.arange(size, dtype=jnp.int32)
    p = jnp.arange(taps_n, dtype=jnp.int32)
    return ((idx[:, None, None] + p[None, :, None]) == k[None, None, :]
            ).astype(jnp.bfloat16)


def resample(chans, local, P: int, precision: str = "f32x2"):
    """Bilinear (P, P) patches from per-feature windows at subpixel corners.

    chans: (C, N, R, L) windows; local: (N, 2) xy window-frame coordinate of
    the patch's (0, 0) tap. Returns (C, N, P, P) in chans.dtype.

    TPU factorization: integer row selection (one-hot matmul, P+1 rows) ->
    float32 row lerp -> integer column selection (one-hot matmul, P+1 cols)
    -> float32 column lerp. The one-hot factors are exact in bfloat16; the
    pixel factor is exact via hi/lo splitting ("f32x2") or rounded to ~0.5
    gray ("bf16"). CPU: the same math via per-feature dynamic slices
    (exact in the working dtype, incl. float64 tests).
    """
    C, N, R, L = chans.shape
    ly = jnp.clip(local[:, 1], 0.0, R - 1.001 - P)
    lx = jnp.clip(local[:, 0], 0.0, L - 1.001 - P)
    iy = jnp.floor(ly)
    ix = jnp.floor(lx)
    fy = (ly - iy)[None, :, None, None]
    fx = (lx - ix)[None, :, None, None]
    if not _use_matmul_impl():
        def one(ch):
            sub = jax.vmap(
                lambda w, y, x: jax.lax.dynamic_slice(
                    w, (y, x), (P + 1, P + 1))
            )(ch, iy.astype(jnp.int32), ix.astype(jnp.int32))
            rows = sub[:, :P] * (1 - fy[0]) + sub[:, 1:] * fy[0]
            return rows[:, :, :P] * (1 - fx[0]) + rows[:, :, 1:] * fx[0]
        return jnp.stack([one(chans[c]) for c in range(C)])
    mm = _mm_exact if precision == "f32x2" else _mm_bf16
    wy = _onehot(iy.astype(jnp.int32), R, P + 1)          # (N, P+1, R)
    wx = _onehot(ix.astype(jnp.int32), L, P + 1)          # (N, P+1, L)
    # rows_ext[n, p, c, v] = chans[c, n, iy+p, v]
    rows_ext = mm(wy, chans, (((2,), (2,)), ((0,), (1,))))  # (N, P+1, C, L)
    rows_ext = jnp.moveaxis(rows_ext, 2, 0)                 # (C, N, P+1, L)
    rows = rows_ext[:, :, :P] * (1 - fy) + rows_ext[:, :, 1:] * fy
    # cols_ext[n, q, c, p] = rows[c, n, p, ix+q] — fold C into the output dim
    # so the batched matmul stays one padded tile per feature, not C
    rows2 = jnp.moveaxis(rows, 0, 2)                        # (N, P, C, L)
    cols_ext = mm(wx, rows2, (((2,), (3,)), ((0,), (0,))))  # (N, P+1, P, C)
    cols_ext = cols_ext.transpose(3, 0, 2, 1)               # (C, N, P, P+1)
    out = cols_ext[..., :P] * (1 - fx) + cols_ext[..., 1:] * fx
    return out.astype(chans.dtype)


def gather_level(ai: AlignedImage, centers, precision: str = "f32x2") -> LevelWindows:
    """Gather + lane-compact the per-feature (ROWS, LANES) window around
    floor(centers) - SEARCH_WD//2.

    The "dma" gather impl keeps the full (ROWS, 2*LANES) window — the lane
    crop exists only to halve the MATMUL paths' downstream width, while the
    resample/kernel consumers handle any width; skipping it saves the
    two-pass crop matmuls."""
    t0 = -(SEARCH_WD // 2)
    win, origin = gather_windows(ai, centers, t0, SEARCH_WD, ROWS, 2 * LANES)
    H, W = ai.shape
    cf = jnp.floor(centers)
    start = jnp.stack([jnp.clip(cf[:, 0], 0, W - 1) + t0,
                       jnp.clip(cf[:, 1], 0, H - 1) + t0], axis=1)
    if gather_impl() == "dma":
        return LevelWindows(win=win[0], origin=origin, start=start)
    lane_off = (start[:, 0] - origin[:, 0]).astype(jnp.int32)
    winc = crop_lanes(win[0], lane_off, LANES)
    origin = origin.at[:, 0].add(lane_off.astype(origin.dtype))
    return LevelWindows(win=winc, origin=origin, start=start)


def _template(lw: LevelWindows, xy, patch: int, precision: str):
    """Template patch + gradients + Hessian terms at subpixel centers xy."""
    r = (patch - 1) // 2
    win = lw.win
    gx = jnp.zeros_like(win).at[:, :, 1:-1].set(0.5 * (win[:, :, 2:] - win[:, :, :-2]))
    gy = jnp.zeros_like(win).at[:, 1:-1, :].set(0.5 * (win[:, 2:, :] - win[:, :-2, :]))
    chans = jnp.stack([win, gx, gy])                       # (3, N, R, L)
    local = xy - lw.origin - r                              # patch (0,0) tap
    ext = resample(chans, local, patch, precision)
    t, tgx, tgy = ext[0], ext[1], ext[2]
    a11 = jnp.sum(tgx * tgx, axis=(1, 2))
    a12 = jnp.sum(tgx * tgy, axis=(1, 2))
    a22 = jnp.sum(tgy * tgy, axis=(1, 2))
    det = a11 * a22 - a12 * a12
    return t, tgx, tgy, a11, a12, a22, det


def _lk_iterate(lw: LevelWindows, tmpl, p_init, patch: int, iters: int,
                precision: str):
    """Clamped fixed-count LK iterations of p over lw.win against tmpl.

    Returns (p, step_norm, residual, interior). Iterates that leave the
    logical search window are clamped (the reference's LK likewise fails
    features whose flow exceeds the window).
    """
    t, tgx, tgy, a11, a12, a22, det = tmpl
    r = (patch - 1) // 2
    dtype = p_init.dtype
    det_ok = det > 1e-6
    det_safe = jnp.where(det_ok, det, 1.0)
    lo = lw.start - lw.origin + r                           # (N, 2) per axis
    hi = lo + (SEARCH_WD - 2 * r - 1.001)

    def resample1(p):
        local = p - lw.origin - r
        return resample(lw.win[None], local, patch, precision)[0]

    p = jnp.clip(p_init, lw.origin + lo, lw.origin + hi - 0.0)
    dnorm = jnp.full((p.shape[0],), jnp.inf, dtype)
    for _ in range(iters):
        cur = resample1(p)
        err = cur - t
        b1 = jnp.sum(tgx * err, axis=(1, 2))
        b2 = jnp.sum(tgy * err, axis=(1, 2))
        dx = (a22 * b1 - a12 * b2) / det_safe
        dy = (a11 * b2 - a12 * b1) / det_safe
        d = jnp.stack([dx, dy], axis=1)
        local = p - lw.origin
        local = jnp.clip(local - d, lo, hi)
        p = lw.origin + local
        dnorm = jnp.linalg.norm(d, axis=1)
    cur = resample1(p)
    res = jnp.mean(jnp.abs(cur - t), axis=(1, 2))
    local = p - lw.origin
    interior = ((local > lo + 1e-3) & (local < hi - 1e-3)).all(axis=1)
    conv = det_ok & (dnorm < 1.0) & interior
    return p, res, conv


def _lk_iterate_pallas(lw: LevelWindows, tmpl, p_init, patch: int, iters: int,
                       interpret: bool = False):
    """Fused-kernel realization of _lk_iterate (ops/lk_pallas.py): all
    iterations of the level run inside ONE Pallas op. Exact-f32 resampling
    (tighter than the hi/lo-bf16 XLA path); identical clamp/convergence
    contract — pinned by tests/test_lk_pallas.py."""
    from ..ops.lk_pallas import AUX_W, lk_iterate_fused

    t, tgx, tgy, a11, a12, a22, det = tmpl
    r = (patch - 1) // 2
    dtype = p_init.dtype
    N = p_init.shape[0]
    det_ok = det > 1e-6
    det_safe = jnp.where(det_ok, det, 1.0)
    lo = lw.start - lw.origin + r
    hi = lo + (SEARCH_WD - 2 * r - 1.001)
    p0l = p_init - lw.origin
    aux = jnp.zeros((N, AUX_W), dtype)
    aux = aux.at[:, 0].set(a11).at[:, 1].set(a12).at[:, 2].set(a22)
    aux = aux.at[:, 3].set(det_safe)
    aux = aux.at[:, 4].set(lo[:, 0]).at[:, 5].set(lo[:, 1])
    aux = aux.at[:, 6].set(hi[:, 0]).at[:, 7].set(hi[:, 1])
    aux = aux.at[:, 10].set(p0l[:, 0]).at[:, 11].set(p0l[:, 1])
    # wide (uncropped, 256-lane) windows double the per-feature VMEM; halve
    # the block so the kernel stays under the scoped-vmem limit
    block_n = 64 if lw.win.shape[-1] <= 128 else 32
    out = lk_iterate_fused(lw.win, t, tgx, tgy, aux, iters, patch, SEARCH_WD,
                           block_n=block_n, interpret=interpret)
    lxy = out[:, :2]
    res = out[:, 2]
    dnorm = out[:, 3]
    p = lw.origin + lxy
    interior = ((lxy > lo + 1e-3) & (lxy < hi - 1e-3)).all(axis=1)
    conv = det_ok & (dnorm < 1.0) & interior
    return p, res, conv


def _lk_level_pallas(lw0: LevelWindows, lw1: LevelWindows, xy0, p_init,
                     patch: int, iters: int, interpret: bool = False,
                     eps: float = 0.01):
    """Fully fused level: template (from lw0 at xy0) + all LK iterations
    (over lw1 from p_init) in ONE Pallas op (ops/lk_pallas.lk_level_fused).
    Replaces the XLA _template chain + the iterate kernel on the TPU path;
    contract pinned against (_template + _lk_iterate) in
    tests/test_lk_pallas.py::test_level_fused_parity."""
    from ..ops.lk_pallas import AUX_W, lk_level_fused

    dtype = p_init.dtype
    N = p_init.shape[0]
    r = (patch - 1) // 2
    lo = lw1.start - lw1.origin + r
    hi = lo + (SEARCH_WD - 2 * r - 1.001)
    p0l = xy0 - lw0.origin
    p1l = p_init - lw1.origin
    aux = jnp.zeros((N, AUX_W), dtype)
    aux = aux.at[:, 0].set(p0l[:, 0]).at[:, 1].set(p0l[:, 1])
    aux = aux.at[:, 4].set(lo[:, 0]).at[:, 5].set(lo[:, 1])
    aux = aux.at[:, 6].set(hi[:, 0]).at[:, 7].set(hi[:, 1])
    aux = aux.at[:, 10].set(p1l[:, 0]).at[:, 11].set(p1l[:, 1])
    block_n = 32 if lw1.win.shape[-1] <= 128 else 16
    out = lk_level_fused(lw0.win, lw1.win, aux, iters, patch, SEARCH_WD,
                         block_n=block_n, interpret=interpret, eps=eps)
    lxy = out[:, :2]
    res = out[:, 2]
    dnorm = out[:, 3]
    det = out[:, 4]
    p = lw1.origin + lxy
    interior = ((lxy > lo + 1e-3) & (lxy < hi - 1e-3)).all(axis=1)
    conv = (det > 1e-6) & (dnorm < 1.0) & interior
    return p, res, conv


def _level_dispatch(lw0, lw1, xy0, p_init, patch, iters, precision):
    """One level-pass: fused kernel on TPU, template+iterate elsewhere."""
    if _use_pallas_lk():
        return _lk_level_pallas(lw0, lw1, xy0, p_init, patch, iters)
    tmpl = _template(lw0, xy0, patch, precision)
    return _lk_iterate(lw1, tmpl, p_init, patch, iters, precision)


def _lk_dispatch(lw, tmpl, p_init, patch, iters, precision):
    if _use_pallas_lk():
        return _lk_iterate_pallas(lw, tmpl, p_init, patch, iters)
    return _lk_iterate(lw, tmpl, p_init, patch, iters, precision)


def track_level(img0, img1, xy0, xy1_init, patch: int, iters: int, eps: float,
                search_radius: int = 9, precision: str = "f32x2"):
    """One pyramid level of LK for all features (compat wrapper over the
    window-gather machinery; prefer forward_backward_track for full frames).
    """
    del eps, search_radius
    ai0 = prepare_image(img0[None], margin=40, precision=precision)
    ai1 = prepare_image(img1[None], margin=40, precision=precision)
    lw0 = gather_level(ai0, xy0, precision)
    lw1 = gather_level(ai1, xy1_init, precision)
    tmpl = _template(lw0, xy0, patch, precision)
    return _lk_iterate(lw1, tmpl, xy1_init, patch, iters, precision)


def _pyr_track_prepared(ais0, ais1, xy0, xy1_guess, patch, iters, precision,
                        want_bwd: bool, max_residual: float = 25.0):
    levels = len(ais0)
    dtype = xy0.dtype
    xy0 = jnp.asarray(xy0, dtype)
    scale = 2.0 ** (levels - 1)
    p1 = jnp.asarray(xy1_guess, dtype) / scale
    lw0_l0 = lw1_l0 = None
    for lv in range(levels - 1, -1, -1):
        s = 2.0 ** lv
        p0_lv = xy0 / s
        if lv != levels - 1:
            p1 = p1 * 2.0
        lw0 = gather_level(ais0[lv], p0_lv, precision)
        lw1 = gather_level(ais1[lv], p1, precision)
        p1, res, conv = _level_dispatch(lw0, lw1, p0_lv, p1, patch, iters,
                                        precision)
        if lv == 0:
            lw0_l0, lw1_l0 = lw0, lw1
    H, W = ais0[0].shape
    inb = ((p1[:, 0] > 2) & (p1[:, 0] < W - 3) & (p1[:, 1] > 2) & (p1[:, 1] < H - 3))
    fwd_ok = conv & inb & (res < max_residual)
    if not want_bwd:
        return KltResult(xy=p1, ok=fwd_ok)
    # backward pass at level 0, reusing the forward windows: template from
    # the img1 window at the forward result, iterate over the img0 window
    # starting at xy0 (flow magnitude <= search radius by construction)
    q, _res_b, conv_b = _level_dispatch(lw1_l0, lw0_l0, p1, xy0, patch,
                                        iters, precision)
    fb = jnp.linalg.norm(q - xy0, axis=1)
    return KltResult(xy=p1, ok=fwd_ok & conv_b), fb


def pyr_track(pyr0, pyr1, xy0, xy1_guess, patch: int = 15, iters: int = 10,
              max_residual: float = 25.0, precision: str = "f32x2"):
    """Coarse-to-fine LK over pyramids (lists/tuples of raw level images or
    prepared AlignedImages, level 0 = full res)."""
    ais0 = _as_prepared(pyr0, precision)
    ais1 = _as_prepared(pyr1, precision)
    return _pyr_track_prepared(ais0, ais1, xy0, xy1_guess, patch, iters,
                               precision, want_bwd=False,
                               max_residual=max_residual)


def forward_backward_track(pyr0, pyr1, xy0, xy1_guess, patch: int = 15,
                           iters: int = 10, fb_thresh: float = 1.0,
                           precision: str = "f32x2"):
    """Forward LK + level-0 reverse consistency gate
    (image_processor.cpp:628-652)."""
    ais0 = _as_prepared(pyr0, precision)
    ais1 = _as_prepared(pyr1, precision)
    res, fb = _pyr_track_prepared(ais0, ais1, xy0, xy1_guess, patch, iters,
                                  precision, want_bwd=True)
    return KltResult(xy=res.xy, ok=res.ok & (fb < fb_thresh))


def _as_prepared(pyr, precision):
    if isinstance(pyr[0], AlignedImage):
        return tuple(pyr)
    return prepare_pyramid(pyr, precision)


def extract_patches(img, centers, taps):
    """Bilinear patches at subpixel centers (compat helper for ORB & tests).

    img: (H, W) or prepared AlignedImage; centers: (N, 2) xy; taps: (P,)
    consecutive integer offsets. Returns (N, P, P).
    """
    taps = np.asarray(taps)
    P = int(taps.shape[0])
    ai = img if isinstance(img, AlignedImage) else prepare_image(
        img[None], margin=40, precision="f32x2")
    rows = -(-(P + 1 + 7) // 8) * 8
    win, origin = gather_windows(ai, centers, int(taps[0]), P + 1,
                                 max(rows, 16), 2 * LANES)
    if gather_impl() == "dma":
        local = centers - origin + taps[0]
        return resample(win, local, P, "f32x2")[0]
    lane_off = jnp.clip(
        (jnp.floor(centers[:, 0]) + int(taps[0]) - origin[:, 0]), 0, LANES - 1
    ).astype(jnp.int32)
    winc = crop_lanes(win[0], lane_off, LANES)
    origin = origin.at[:, 0].add(lane_off.astype(origin.dtype))
    local = centers - origin + taps[0]
    return resample(winc[None], local, P, "f32x2")[0]
