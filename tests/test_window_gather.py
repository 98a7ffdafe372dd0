"""Cross-impl parity for ops/window_gather: the TPU one-hot-matmul path and
the CPU dynamic-slice path must produce the same windows, origins, and
resampled patches (the TPU path to ~2^-17 of full scale in 'f32x2')."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import orcvio_tpu.ops.window_gather as wg
from orcvio_tpu.frontend import klt

RNG = np.random.default_rng(17)


@pytest.fixture
def force_impl(monkeypatch):
    def set_impl(name):
        monkeypatch.setenv("ORCVIO_GATHER_IMPL", name)
    return set_impl


def _mk(H=120, W=160, N=40):
    img = jnp.asarray(RNG.uniform(0, 255, (1, H, W)), jnp.float32)
    # positions spanning the interior AND clamped border cases
    xy = np.concatenate([
        RNG.uniform([3, 3], [W - 3, H - 3], size=(N - 8, 2)),
        np.array([[0.2, 0.3], [W - 1.2, 0.4], [0.5, H - 1.5],
                  [W - 1.5, H - 1.1], [1.0, 60.0], [W - 2.0, 60.0],
                  [80.0, 1.0], [80.0, H - 2.0]]),
    ])
    return img, jnp.asarray(xy, jnp.float32)


def _logical(win, origin, start, wd):
    """Extract the logical wd-window from each aligned window."""
    out = []
    for n in range(win.shape[0]):
        dx = int(start[n, 0] - origin[n, 0])
        dy = int(start[n, 1] - origin[n, 1])
        out.append(np.asarray(win[n, dy:dy + wd, dx:dx + wd]))
    return np.stack(out)


def test_matmul_vs_slice_windows(force_impl):
    img, xy = _mk()
    t0, wd, rows, lanes = -17, 36, 48, 256
    H, W = img.shape[1:]
    cf = np.floor(np.asarray(xy))
    start = np.stack([np.clip(cf[:, 0], 0, W - 1) + t0,
                      np.clip(cf[:, 1], 0, H - 1) + t0], axis=1)

    force_impl("slice")
    ai_s = wg.prepare_image(img)
    win_s, org_s = wg.gather_windows(ai_s, xy, t0, wd, rows, lanes)

    force_impl("matmul")
    ai_m = wg.prepare_image(img)
    win_m, org_m = wg.gather_windows(ai_m, xy, t0, wd, rows, lanes)

    assert np.array_equal(np.asarray(org_s), np.asarray(org_m))
    ls = _logical(np.asarray(win_s[0]), np.asarray(org_s), start, wd)
    lm = _logical(np.asarray(win_m[0]), np.asarray(org_m), start, wd)
    assert np.max(np.abs(ls - lm)) < 0.005  # 2^-17 * 255 with headroom


def test_crop_lanes_parity(force_impl):
    win = jnp.asarray(RNG.uniform(0, 255, (20, 16, 256)), jnp.float32)
    off = jnp.asarray(RNG.integers(0, 200, (20,)), jnp.int32)
    force_impl("slice")
    a = wg.crop_lanes(win, off, 128)
    force_impl("matmul")
    b = wg.crop_lanes(win, off, 128)
    assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 0.005


def test_resample_parity_and_exactness(force_impl):
    chans = jnp.asarray(RNG.uniform(0, 255, (2, 30, 48, 128)), jnp.float32)
    local = jnp.asarray(RNG.uniform([0, 0], [100, 25], size=(30, 2)),
                        jnp.float32)
    force_impl("slice")
    a = klt.resample(chans, local, 15)
    force_impl("matmul")
    b = klt.resample(chans, local, 15, "f32x2")
    c = klt.resample(chans, local, 15, "bf16")
    assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 0.005
    assert np.max(np.abs(np.asarray(a) - np.asarray(c))) < 1.5  # ~0.5 gray

    # exactness of the slice path against direct bilinear interpolation
    n, P = 7, 15
    ch = np.asarray(chans[0, n])
    lx, ly = float(local[n, 0]), float(local[n, 1])
    ix, iy = int(np.floor(lx)), int(np.floor(ly))
    fx, fy = lx - ix, ly - iy
    direct = ((1 - fy) * (1 - fx) * ch[iy:iy + P, ix:ix + P]
              + (1 - fy) * fx * ch[iy:iy + P, ix + 1:ix + P + 1]
              + fy * (1 - fx) * ch[iy + 1:iy + P + 1, ix:ix + P]
              + fy * fx * ch[iy + 1:iy + P + 1, ix + 1:ix + P + 1])
    assert np.max(np.abs(np.asarray(a[0, n]) - direct)) < 1e-3


def test_track_level_fullframe_parity(force_impl):
    """The whole LK level must agree across impls on a real tracking task."""
    from tests.test_frontend import shift_image, smooth_texture

    img0 = smooth_texture(120, 160, seed=12)
    img1 = shift_image(img0, jnp.asarray([2.5, -1.5], jnp.float32))
    xy0 = jnp.asarray(RNG.uniform([20, 20], [140, 100], size=(25, 2)),
                      jnp.float32)
    force_impl("slice")
    pa, ra, ca = klt.track_level(img0, img1, xy0, xy0, 15, 10, 0.01)
    force_impl("matmul")
    pb, rb, cb = klt.track_level(img0, img1, xy0, xy0, 15, 10, 0.01)
    ok = np.asarray(ca) & np.asarray(cb)
    assert ok.sum() >= 20
    d = np.linalg.norm(np.asarray(pa - pb), axis=1)[ok]
    assert d.max() < 0.02, d.max()
