"""Race extraction and resample fixes in-scan. Run: python scripts/race_fix.py"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend import klt
from orcvio_tpu.ops.window_extract import padded_windows

H, W, N, T = 480, 752, 200, 30
PATCH = 15
WD = 35 + 1
rng0 = np.random.default_rng(0)


def bench(tag, level_fn, reps=5):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (T + 1, H, W)), jnp.float32)
    xy0 = jnp.asarray(rng.uniform(40, 400, (N, 2)), jnp.float32)

    def step(xy, pair):
        img0, img1 = pair
        out = level_fn(img0, img1, xy)
        newxy = out if out.shape == (N, 2) else xy + 0.001 * jnp.mean(out) * jnp.ones((N, 2))
        newxy = jnp.clip(newxy, 40.0, 400.0)
        return newxy, jnp.sum(newxy)

    # NB: pass arrays as ARGS — closure-captured device arrays are re-staged
    # per call on the tunneled platform (~170 us/step pollution)
    f = jax.jit(lambda xy, ims: jax.lax.scan(step, xy, (ims[:-1], ims[1:])))
    out = jax.block_until_ready(f(xy0, imgs))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(xy0, imgs)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (reps * T) * 1e6
    print(f"{tag:58s} {us:9.1f} us/frame")
    return us


# ---------- extraction variants ----------
def ex_current(i0, i1, xy):
    wins, origin = padded_windows(i1[None], jnp.round(xy), -(WD // 2), WD)
    return jnp.sum(wins * wins) * jnp.ones((1,))


def ex_zeropad_aligned(i0, i1, xy):
    """Zero pad, lane-aligned width, no edge mode, int origins clamped."""
    PADT = 40
    WP = ((W + 2 * PADT + 127) // 128) * 128
    p = jnp.pad(i1, ((PADT, PADT), (PADT, WP - W - PADT)))
    cf = jnp.floor(xy)
    oy = jnp.clip(cf[:, 1], 0, H - 1).astype(jnp.int32) + PADT - WD // 2
    ox = jnp.clip(cf[:, 0], 0, W - 1).astype(jnp.int32) + PADT - WD // 2
    wins = jax.vmap(lambda y, x: jax.lax.dynamic_slice(p, (y, x), (WD, WD)))(oy, ox)
    return jnp.sum(wins * wins) * jnp.ones((1,))


def ex_edgepad_aligned(i0, i1, xy):
    PADT = 40
    WP = ((W + 2 * PADT + 127) // 128) * 128
    p = jnp.pad(i1, ((PADT, PADT), (PADT, PADT)), mode="edge")
    p = jnp.pad(p, ((0, 0), (0, WP - p.shape[1])))
    cf = jnp.floor(xy)
    oy = jnp.clip(cf[:, 1], 0, H - 1).astype(jnp.int32) + PADT - WD // 2
    ox = jnp.clip(cf[:, 0], 0, W - 1).astype(jnp.int32) + PADT - WD // 2
    wins = jax.vmap(lambda y, x: jax.lax.dynamic_slice(p, (y, x), (WD, WD)))(oy, ox)
    return jnp.sum(wins * wins) * jnp.ones((1,))


def ex_nopad_clamp(i0, i1, xy):
    """No pad at all: clamp origins so windows stay inside (edge semantics
    differ at the border but the border is rare)."""
    cf = jnp.floor(xy)
    oy = jnp.clip(cf[:, 1] - WD // 2, 0, H - WD).astype(jnp.int32)
    ox = jnp.clip(cf[:, 0] - WD // 2, 0, W - WD).astype(jnp.int32)
    wins = jax.vmap(lambda y, x: jax.lax.dynamic_slice(i1, (y, x), (WD, WD)))(oy, ox)
    return jnp.sum(wins * wins) * jnp.ones((1,))


def ex_128wide(i0, i1, xy):
    """No pad, grab 128-wide slabs (lane-tile width), origin 8-aligned rows."""
    cf = jnp.floor(xy)
    oy = jnp.clip(cf[:, 1] - WD // 2, 0, H - WD).astype(jnp.int32)
    ox = jnp.clip(cf[:, 0] - WD // 2, 0, W - 128).astype(jnp.int32)
    wins = jax.vmap(lambda y, x: jax.lax.dynamic_slice(i1, (y, x), (WD, 128)))(oy, ox)
    return jnp.sum(wins * wins) * jnp.ones((1,))


# ---------- resample variants (10 iterations on fixed windows) ----------
def mk_iters(resample, iters=10):
    def fn(i0, i1, xy):
        cf = jnp.floor(xy)
        oy = jnp.clip(cf[:, 1] - WD // 2, 0, H - WD).astype(jnp.int32)
        ox = jnp.clip(cf[:, 0] - WD // 2, 0, W - WD).astype(jnp.int32)
        windows = jax.vmap(lambda y, x: jax.lax.dynamic_slice(i1, (y, x), (WD, WD)))(oy, ox)
        origin = jnp.stack([ox, oy], 1).astype(xy.dtype)
        t = windows[:, :PATCH, :PATCH]
        gx = windows[:, :PATCH, 1:PATCH + 1] - t
        gy = windows[:, 1:PATCH + 1, :PATCH] - t
        a11 = jnp.sum(gx * gx, axis=(1, 2)) + 1.0
        a22 = jnp.sum(gy * gy, axis=(1, 2)) + 1.0
        a12 = jnp.sum(gx * gy, axis=(1, 2))
        det = a11 * a22 - a12 * a12
        p1 = xy
        r = (PATCH - 1) // 2
        for _ in range(iters):
            local = jnp.clip(p1 - origin, r, WD - 2.0 - r)
            cur = resample(windows, local - r)  # window-frame top-left corner
            err = cur - t
            b1 = jnp.sum(gx * err, axis=(1, 2))
            b2 = jnp.sum(gy * err, axis=(1, 2))
            dx = (a22 * b1 - a12 * b2) / det
            dy = (a11 * b2 - a12 * b1) / det
            p1 = origin + jnp.clip(local - jnp.stack([dx, dy], 1), r, WD - 2.0 - r)
        return p1
    return fn


def rs_onehot_highest(windows, tl):
    taps = np.arange(0, PATCH)
    with jax.default_matmul_precision("highest"):
        wy = klt._axis_weights(tl[:, 1], WD, taps)
        wx = klt._axis_weights(tl[:, 0], WD, taps)
        rows = jnp.einsum("npw,nwv->npv", wy, windows)
        return jnp.einsum("npv,nqv->npq", rows, wx)


def rs_onehot_default(windows, tl):
    taps = np.arange(0, PATCH)
    wy = klt._axis_weights(tl[:, 1], WD, taps)
    wx = klt._axis_weights(tl[:, 0], WD, taps)
    rows = jnp.einsum("npw,nwv->npv", wy, windows, precision="default")
    return jnp.einsum("npv,nqv->npq", rows, wx, precision="default")


def rs_shiftblend(windows, tl):
    """Integer dyn-slice (P+1,P+1) + 4-tap fractional blend. Pure VPU+gather."""
    i0f = jnp.floor(tl)
    iy = i0f[:, 1].astype(jnp.int32)
    ix = i0f[:, 0].astype(jnp.int32)
    f = tl - i0f
    fx = f[:, 0][:, None, None]
    fy = f[:, 1][:, None, None]
    sub = jax.vmap(lambda w, y, x: jax.lax.dynamic_slice(w, (y, x), (PATCH + 1, PATCH + 1)))(
        windows, iy, ix)
    p00 = sub[:, :PATCH, :PATCH]
    p01 = sub[:, :PATCH, 1:]
    p10 = sub[:, 1:, :PATCH]
    p11 = sub[:, 1:, 1:]
    return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy + p11 * fx * fy)


def main():
    print("-- extraction (search windows, in-scan) --")
    bench("current padded_windows(edge,822w)", ex_current)
    bench("zero-pad lane-aligned 896w", ex_zeropad_aligned)
    bench("edge-pad lane-aligned 896w", ex_edgepad_aligned)
    bench("no-pad clamped origins", ex_nopad_clamp)
    bench("no-pad 128-wide slabs", ex_128wide)
    print("-- 10 LK iterations on fixed windows --")
    bench("onehot einsum highest", mk_iters(rs_onehot_highest))
    bench("onehot einsum default", mk_iters(rs_onehot_default))
    bench("shifted-blend (dynslice+VPU)", mk_iters(rs_shiftblend))
    bench("shifted-blend 3 iters", mk_iters(rs_shiftblend, iters=3))


if __name__ == "__main__":
    main()
