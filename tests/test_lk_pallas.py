"""Fused Pallas LK level-iterate kernel vs the XLA `_lk_iterate` path.

Pins the contract claimed in frontend/klt.py:215 (`_lk_iterate_pallas`):
 * interpret-mode parity with `_lk_iterate` on identical windows/templates
   (the kernel is exact f32; the CPU `_lk_iterate` resample is exact via
   dynamic slices, so the two must agree to float32 roundoff);
 * a precision regression guard: every dot inside the kernel must request
   HIGHEST precision — Mosaic's default f32 dot lowers to single-pass bf16
   on the MXU, which rounds selected pixels to ~0.5 gray and (measured,
   commit 505c719) degraded S1_slow 900-frame ATE 0.039 -> 0.785 m;
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


def test_kernel_dots_request_highest_precision():
    """Regression guard for the Mosaic bf16 single-pass dot failure mode.

    Every dot_general inside the kernel's resample must pass
    precision=HIGHEST (commit 505c719: without it the one-hot pixel
    selections round to ~0.5 gray on TPU and the 900-frame ATE degrades
    20x). Checked statically on the kernel source so it holds for the
    real-TPU lowering, which interpret-mode tests cannot exercise.
    """
    src = inspect.getsource(lk_pallas)
    tree = ast.parse(src)
    dots = [node for node in ast.walk(tree)
            if isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "dot_general"]
    assert dots, "expected dot_general calls in ops/lk_pallas.py"
    for call in dots:
        kw = {k.arg: k.value for k in call.keywords}
        assert "precision" in kw, "dot_general without explicit precision"
        prec = ast.dump(kw["precision"])
        assert "HIGHEST" in prec, f"dot_general precision is not HIGHEST: {prec}"
