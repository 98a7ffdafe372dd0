"""In-scan bisection of track_level internals (scan protocol, varying data).

Run: python scripts/scan_klt2.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend import klt
from orcvio_tpu.frontend.image import gradients
from orcvio_tpu.ops.window_extract import padded_windows

H, W, N, T = 480, 752, 200, 30
PATCH, ITERS = 15, 10


def bench(tag, level_fn, reps=5):
    """level_fn(img0, img1, xy) -> (N,2) new positions (or any array)."""
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (T + 1, H, W)), jnp.float32)
    xy0 = jnp.asarray(rng.uniform(40, 400, (N, 2)), jnp.float32)

    def step(xy, pair):
        img0, img1 = pair
        out = level_fn(img0, img1, xy)
        newxy = out if out.shape == (N, 2) else xy + 0.001 * jnp.mean(out)
        newxy = jnp.clip(newxy, 40.0, 400.0)
        return newxy, jnp.sum(newxy)

    def scan(xy):
        return jax.lax.scan(step, xy, (imgs[:-1], imgs[1:]))

    f = jax.jit(scan)
    out = jax.block_until_ready(f(xy0))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(xy0)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (reps * T) * 1e6
    print(f"{tag:56s} {us:9.1f} us/frame")
    return us


def full_level(i0, i1, xy):
    p1, res, conv = klt.track_level(i0, i1, xy, xy, PATCH, ITERS, 0.01)
    return p1


def level_iters(i0, i1, xy, iters):
    p1, res, conv = klt.track_level(i0, i1, xy, xy, PATCH, iters, 0.01)
    return p1


def extraction_only(i0, i1, xy):
    r = (PATCH - 1) // 2
    Wd = PATCH + 2 * 9 + 2
    wins1, origin = padded_windows(i1[None], jnp.round(xy), -(Wd // 2), Wd)
    return jnp.sum(wins1 * wins1) * jnp.ones((1,))


def template_only(i0, i1, xy):
    r = (PATCH - 1) // 2
    taps = np.arange(-r, r + 1)
    Ix, Iy = gradients(i0)
    big = jnp.stack([i0, Ix, Iy])
    wins0, origin0 = padded_windows(big, xy, -r, PATCH + 1)
    local0 = xy - origin0
    ext = jax.vmap(lambda w: klt._local_sample(w, local0, taps))(wins0)
    return jnp.sum(ext * ext) * jnp.ones((1,))


def iterations_only(i0, i1, xy):
    """Fixed pre-extracted window math: isolates the per-iteration cost."""
    r = (PATCH - 1) // 2
    taps = np.arange(-r, r + 1)
    Wd = PATCH + 2 * 9 + 2
    wins1, origin = padded_windows(i1[None], jnp.round(xy), -(Wd // 2), Wd)
    windows = wins1[0]
    t = windows[:, :PATCH, :PATCH]
    gx = windows[:, 1:PATCH + 1, :PATCH] - windows[:, :PATCH, :PATCH]
    gy = gx
    a11 = jnp.sum(gx * gx, axis=(1, 2)) + 1.0
    a12 = jnp.zeros_like(a11)
    a22 = a11
    det_safe = a11 * a22 + 1.0
    lo, hi = jnp.asarray(0.0), jnp.asarray(Wd - 1.001)
    p1 = xy
    for _ in range(ITERS):
        local = jnp.clip(p1 - origin, lo + r, hi - r)
        cur = klt._local_sample(windows, local, taps)
        err = cur - t
        b1 = jnp.sum(gx * err, axis=(1, 2))
        b2 = jnp.sum(gy * err, axis=(1, 2))
        dx = (a22 * b1 - a12 * b2) / det_safe
        dy = (a11 * b2 - a12 * b1) / det_safe
        p1 = origin + jnp.clip(local - jnp.stack([dx, dy], 1), lo + r, hi - r)
    return p1


def local_sample_prec(precision):
    def _local_sample(windows, local_xy, taps):
        Wy, Wx = windows.shape[-2:]
        wy = klt._axis_weights(local_xy[:, 1], Wy, taps)
        wx = klt._axis_weights(local_xy[:, 0], Wx, taps)
        rows = jnp.einsum("npw,nwv->npv", wy, windows, precision=precision)
        return jnp.einsum("npv,nqv->npq", rows, wx, precision=precision)
    return _local_sample


def main():
    bench("track_level full (10 iters)", full_level)
    bench("track_level 1 iter", lambda a, b, x: level_iters(a, b, x, 1))
    bench("track_level 0 iters", lambda a, b, x: level_iters(a, b, x, 0))
    bench("extraction only (search windows)", extraction_only)
    bench("template only (grad+extract+resample)", template_only)
    bench("iterations only (10, fixed windows)", iterations_only)
    orig = klt._local_sample
    try:
        for prec in ("default", "high"):
            klt._local_sample = local_sample_prec(prec)
            bench(f"track_level full, {prec} resample precision", full_level)
    finally:
        klt._local_sample = orig


if __name__ == "__main__":
    main()
