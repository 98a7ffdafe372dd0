"""Trustworthy front-end bisection: T-frame tracker-only lax.scan, one
dispatch, per-frame-varying images. Per-frame cost = total / T.

The tunneled (axon) platform appears to dedupe identical dispatches, so
per-call micro-benchmarks lie; scans with varying data do not.

Run: python scripts/scan_bisect.py [--batch B]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import orcvio_tpu.frontend.detect as detect
import orcvio_tpu.frontend.image as fimage
import orcvio_tpu.frontend.klt as klt
import orcvio_tpu.frontend.orb as orb
import orcvio_tpu.frontend.ransac as ransac
import orcvio_tpu.frontend.tracker as tracker
import orcvio_tpu.frontend.undistort as undist
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState

H, W, N, T = 480, 752, 200, 50


def make_images():
    """Smooth drifting pattern so KLT has real structure to track."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H + 64, W + 64)).astype(np.float32)
    # blur to make it trackable
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d

    base = convolve2d(base, k, mode="same")
    imgs = np.empty((T, H, W), np.float32)
    for t in range(T):
        dx, dy = int(t * 0.7) % 40, int(t * 0.4) % 40
        imgs[t] = base[dy:dy + H, dx:dx + W]
    return jnp.asarray(imgs)


def bench_scan(tag, tc, batch=None, reps=3):
    imgs = make_images()
    ts0 = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    times = jnp.arange(T, dtype=jnp.float32) * 0.05 + 0.05

    def step(ts, xs):
        img, t, idx = xs
        ts, out = tracker.process_frame(tc, ts, img, t, gyro, Rbc, frame_idx=idx)
        return ts, out.uvs

    def scan(ts, imgs):
        xs = (imgs, times, jnp.arange(T, dtype=jnp.int32))
        return jax.lax.scan(step, ts, xs)

    if batch:
        fn = jax.jit(jax.vmap(scan, in_axes=(0, 0)))
        ts0 = jax.tree.map(lambda x: jnp.stack([x] * batch), ts0)
        imgs = jnp.stack([imgs + 0.01 * i for i in range(batch)])
    else:
        fn = jax.jit(scan)
    out = jax.block_until_ready(fn(ts0, imgs))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ts0, imgs)
    jax.block_until_ready(out)
    frames = T * reps * (batch or 1)
    ms = (time.perf_counter() - t0) / frames * 1e3
    agg = f"  agg {1e3 / ms * (1 if not batch else 1):.0f} f/s"
    print(f"{tag:52s} {ms:8.3f} ms/frame{agg}")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-only", action="store_true")
    args = ap.parse_args()

    base_kw = dict(height=H, width=W, capacity=N, equalize=True, detect_every=2)
    tc = TrackerConfig(pyramid_levels=4, **base_kw)

    bench_scan("tracker scan B=1", tc)
    for B in (4, 8):
        bench_scan(f"tracker scan B={B}", tc, batch=B)
    if args.full_only:
        return

    # stub KLT
    orig = klt.forward_backward_track
    stub = lambda p0, p1, xy, g, patch=15, iters=10, **kw: klt.KltResult(
        xy=g, ok=jnp.ones((xy.shape[0],), bool))
    klt.forward_backward_track = stub
    tracker.forward_backward_track = stub
    bench_scan("  - klt (stubbed)", tc)
    bench_scan("  - klt (stubbed) B=8", tc, batch=8)
    klt.forward_backward_track = orig
    tracker.forward_backward_track = orig

    # fwd only
    fwd = lambda p0, p1, xy, g, patch=15, iters=10, **kw: klt.pyr_track(
        p0, p1, xy, g, patch, iters, **kw)
    klt.forward_backward_track = fwd
    tracker.forward_backward_track = fwd
    bench_scan("  fwd-only klt", tc)
    klt.forward_backward_track = orig
    tracker.forward_backward_track = orig

    # stub detect
    orig_d = detect.detect_grid
    def dstub(img, per_cell, rows, cols, occupied_xy=None, occupied_mask=None,
              min_distance=20.0):
        C = per_cell * rows * cols
        return (jnp.zeros((C, 2), img.dtype), jnp.zeros((C,), img.dtype),
                jnp.zeros((C,), bool))
    detect.detect_grid = dstub
    tracker.detect_grid = dstub
    bench_scan("  - detect (stubbed)", tc)
    detect.detect_grid = orig_d
    tracker.detect_grid = orig_d

    # stub orb describe
    orig_o = orb.describe
    orb.describe = lambda img, xy: jnp.zeros((xy.shape[0], 8), jnp.uint32)
    tracker_orb = tracker.orb
    bench_scan("  - orb.describe (stubbed)", tc)
    orb.describe = orig_o

    # stub ransac
    orig_r = ransac.ransac_fundamental
    rstub = lambda a, b, m, k, thresh=0.0: (jnp.ones((a.shape[0],), bool),
                                            jnp.eye(3, dtype=a.dtype))
    ransac.ransac_fundamental = rstub
    tracker.ransac_fundamental = rstub
    bench_scan("  - ransac (stubbed)", tc)
    ransac.ransac_fundamental = orig_r
    tracker.ransac_fundamental = orig_r

    # stub equalize
    orig_e = fimage.equalize_hist
    fimage.equalize_hist = lambda im: im
    tracker.equalize_hist = fimage.equalize_hist
    bench_scan("  - equalize (stubbed)", tc)
    fimage.equalize_hist = orig_e
    tracker.equalize_hist = orig_e

    # levels / iters sweep
    bench_scan("L=2 iters=10", TrackerConfig(pyramid_levels=2, **base_kw))
    bench_scan("L=4 iters=3", TrackerConfig(pyramid_levels=4, klt_iters=3, **base_kw))
    bench_scan("L=3 iters=10", TrackerConfig(pyramid_levels=3, **base_kw))


if __name__ == "__main__":
    main()
