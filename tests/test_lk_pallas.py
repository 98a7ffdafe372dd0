"""Fused Pallas LK level-iterate kernel vs the XLA `_lk_iterate` path.

Pins the contract claimed in frontend/klt.py:215 (`_lk_iterate_pallas`):
 * interpret-mode parity with `_lk_iterate` on identical windows/templates
   (the kernel is exact f32; the CPU `_lk_iterate` resample is exact via
   dynamic slices, so the two must agree to float32 roundoff);
 * a precision regression guard: all in-kernel dots must go through the
   exact hi/lo-split `_dot2` — a bare f32 dot would lower to single-pass
   bf16 on the MXU, rounding selected pixels to ~0.5 gray (measured,
   commit 505c719: S1_slow 900-frame ATE 0.039 -> 0.785 m);
 * the padding / block_n edge cases (N not a multiple of block_n, N < block_n).
"""
import ast
import inspect

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.frontend.klt import (
    ROWS, LANES, SEARCH_WD, LevelWindows, _lk_iterate, _lk_iterate_pallas,
    _template,
)
from orcvio_tpu.ops import lk_pallas

RNG = np.random.default_rng(7)

PATCH = 15
ITERS = 10


def _make_case(n, shift_scale=3.0, seed=0):
    """Synthetic smooth windows + per-feature true shifts.

    Builds one large smooth 'image' texture, then a template window (img0)
    and a shifted search window (img1) per feature, exactly the shapes
    gather_level produces: win (N, ROWS, LANES) f32 with the logical search
    window starting at `start` inside it.
    """
    rng = np.random.default_rng(seed)
    H, W = 256, 384
    base = rng.normal(size=(H // 8, W // 8))
    # smooth, high-contrast texture (bicubic-ish upsample via FFT zero-pad)
    img = np.kron(base, np.ones((8, 8)))
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, 3.0) * 400.0 + 128.0
    img = img.astype(np.float32)

    shifts = rng.uniform(-shift_scale, shift_scale, size=(n, 2)).astype(np.float32)
    cx = rng.uniform(80, W - 80, size=n).astype(np.float32)
    cy = rng.uniform(80, H - 80, size=n).astype(np.float32)

    r = (PATCH - 1) // 2
    t0 = -(SEARCH_WD // 2)
    win0 = np.zeros((n, ROWS, LANES), np.float32)
    win1 = np.zeros((n, ROWS, LANES), np.float32)
    origin = np.zeros((n, 2), np.float32)
    start = np.zeros((n, 2), np.float32)
    yy, xx = np.mgrid[0:ROWS, 0:LANES]
    for i in range(n):
        ox = np.floor(cx[i]) + t0 - 8  # origin 8 px left of the logical start
        oy = np.floor(cy[i]) + t0
        origin[i] = (ox, oy)
        start[i] = (np.floor(cx[i]) + t0, np.floor(cy[i]) + t0)
        # img0 window: plain crop; img1 window: same crop of the shifted image
        gy = np.clip(yy + int(oy), 0, H - 1)
        gx = np.clip(xx + int(ox), 0, W - 1)
        win0[i] = img[gy, gx]
        # bilinear sample of img at (x + sx, y + sy) = shifted content
        sx, sy = shifts[i]
        fy, fx_ = np.floor(sy), np.floor(sx)
        ay, ax_ = sy - fy, sx - fx_
        g2y = np.clip(yy + int(oy) + int(fy), 0, H - 2)
        g2x = np.clip(xx + int(ox) + int(fx_), 0, W - 2)
        w = img
        win1[i] = ((1 - ay) * (1 - ax_) * w[g2y, g2x]
                   + (1 - ay) * ax_ * w[g2y, g2x + 1]
                   + ay * (1 - ax_) * w[g2y + 1, g2x]
                   + ay * ax_ * w[g2y + 1, g2x + 1])

    lw0 = LevelWindows(win=jnp.asarray(win0), origin=jnp.asarray(origin),
                       start=jnp.asarray(start))
    lw1 = LevelWindows(win=jnp.asarray(win1), origin=jnp.asarray(origin),
                       start=jnp.asarray(start))
    xy0 = jnp.asarray(np.stack([cx, cy], axis=1))
    return lw0, lw1, xy0, shifts


def _run_both(n, seed=0, block_n=64):
    lw0, lw1, xy0, shifts = _make_case(n, seed=seed)
    tmpl = _template(lw0, xy0, PATCH, "f32x2")
    p_ref, res_ref, conv_ref = _lk_iterate(lw1, tmpl, xy0, PATCH, ITERS, "f32x2")
    p_k, res_k, conv_k = _lk_iterate_pallas(lw1, tmpl, xy0, PATCH, ITERS,
                                            interpret=True)
    return (np.asarray(p_ref), np.asarray(res_ref), np.asarray(conv_ref),
            np.asarray(p_k), np.asarray(res_k), np.asarray(conv_k), shifts)


def test_interpret_parity():
    """Kernel (interpret mode) vs the XLA/CPU iterate: same fixed-point."""
    p_ref, res_ref, conv_ref, p_k, res_k, conv_k, shifts = _run_both(64)
    # positions agree to float32 roundoff of the iteration (both exact f32)
    assert np.abs(p_k - p_ref).max() < 1e-3, np.abs(p_k - p_ref).max()
    assert np.abs(res_k - res_ref).max() < 1e-2
    assert (conv_k == conv_ref).mean() > 0.95


def test_tracks_true_shift():
    lw0, lw1, xy0, shifts = _make_case(96, seed=3)
    tmpl = _template(lw0, xy0, PATCH, "f32x2")
    p_k, res_k, conv_k = _lk_iterate_pallas(lw1, tmpl, xy0, PATCH, ITERS,
                                            interpret=True)
    flow = np.asarray(p_k) - np.asarray(xy0)
    err = np.linalg.norm(flow + shifts, axis=1)
    ok = np.asarray(conv_k)
    assert ok.mean() > 0.8, ok.mean()
    assert np.median(err[ok]) < 0.25, np.median(err[ok])


@pytest.mark.parametrize("n", [1, 5, 63, 64, 65, 130])
def test_padding_block_edges(n):
    """N below / at / above block_n and across two blocks must all agree."""
    p_ref, _, conv_ref, p_k, _, conv_k, _ = _run_both(n, seed=n)
    assert p_k.shape == (n, 2)
    assert np.abs(p_k - p_ref).max() < 1e-3
    assert (conv_k == conv_ref).mean() > 0.9


def test_kernel_dots_are_exact():
    """Regression guard for the Mosaic bf16 single-pass dot failure mode
    (commit 505c719: an f32 dot lowered to ONE bf16 pass rounds selected
    pixels to ~0.5 gray and degraded the 900-frame ATE 20x).

    The kernel's selections are exact by construction: every in-kernel
    dot_general must live inside `_dot2` — a 0/1 bf16 one-hot contracted
    against an explicit hi/lo bf16 split of the pixels (two single-pass
    dots whose f32 accumulation restores the pixel to ~2^-8 ulp). An f32
    dot_general outside _dot2 would silently reintroduce the single-pass
    rounding, so: statically require all dot_generals to be in _dot2, and
    numerically require the split selection to reproduce f64 ground truth.
    """
    src = inspect.getsource(lk_pallas)
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            dots = [c for c in ast.walk(node)
                    if isinstance(c, ast.Call)
                    and isinstance(c.func, ast.Attribute)
                    and c.func.attr == "dot_general"]
            if node.name == "_dot2":
                assert len(dots) == 2
            else:
                assert not dots, (
                    f"dot_general outside _dot2 in {node.name}: the exact "
                    "hi/lo split contract would be bypassed")

    # numeric: hi/lo-split one-hot selection reproduces the f64 answer
    vals = np.asarray(RNG.uniform(0, 255.0, (1, 48, 128)), np.float32)
    hi, lo = lk_pallas._split_hi_lo(jnp.asarray(vals))
    onehot = np.zeros((1, 4, 48), np.float32)
    idx = [3, 17, 30, 44]
    for p, i in enumerate(idx):
        onehot[0, p, i] = 1.0
    sel = lk_pallas._dot2(jnp.asarray(onehot, jnp.bfloat16), hi, lo,
                          (((2,), (1,)), ((0,), (0,))), jnp.float32)
    truth = vals[0, idx]
    assert np.abs(np.asarray(sel)[0] - truth).max() < 4e-3  # ~2^-8 gray


def test_level_fused_parity():
    """lk_level_fused (template+iterate, one kernel) vs _template +
    _lk_iterate on identical windows (interpret mode): same positions,
    convergence flags, and residuals. The in-kernel template takes central
    differences INSIDE one (P+2) patch; by linearity of bilinear
    interpolation that equals resampling precomputed gradient arrays except
    at window borders the patch never touches, so agreement is to the
    hi/lo split error (~2^-8 gray -> <<1e-2 px)."""
    from orcvio_tpu.frontend.klt import _lk_level_pallas

    lw0, lw1, xy0, shifts = _make_case(96, seed=11)
    tmpl = _template(lw0, xy0, PATCH, "f32x2")
    p_ref, res_ref, conv_ref = _lk_iterate(lw1, tmpl, xy0, PATCH, ITERS, "f32x2")
    p_k, res_k, conv_k = _lk_level_pallas(lw0, lw1, xy0, xy0, PATCH, ITERS,
                                          interpret=True, eps=0.0)
    p_ref, p_k = np.asarray(p_ref), np.asarray(p_k)
    assert np.abs(p_k - p_ref).max() < 1e-2, np.abs(p_k - p_ref).max()
    assert np.abs(np.asarray(res_k) - np.asarray(res_ref)).max() < 0.1
    assert (np.asarray(conv_k) == np.asarray(conv_ref)).mean() > 0.95
