"""Per-stage front-end timing on the default device at bench shapes.

Times each tracker stage jitted in isolation (block_until_ready fences),
plus the full process_frame and the filter step, to direct perf work.
Run: python scripts/profile_frontend.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend import orb
from orcvio_tpu.frontend.detect import detect_grid
from orcvio_tpu.frontend.image import build_pyramid, equalize_hist
from orcvio_tpu.frontend.klt import forward_backward_track
from orcvio_tpu.frontend.ransac import ransac_fundamental
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame
from orcvio_tpu.frontend.undistort import undistort_pixels

H, W, N = 480, 752, 200
LEVELS = 4


def timeit(name, fn, *args, reps=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    xy = jnp.asarray(
        np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], 1),
        jnp.float32)
    xy2 = xy + 1.5
    mask = jnp.ones((N,), bool)
    desc = jnp.asarray(rng.integers(0, 2**32, (N, 8)), jnp.uint32)
    uvn = (xy - jnp.asarray([W / 2, H / 2])) / 400.0
    key = jax.random.PRNGKey(0)

    print(f"device: {jax.devices()[0].platform}, shapes H={H} W={W} N={N}")
    timeit("equalize_hist", equalize_hist, img)
    timeit("build_pyramid", lambda im: tuple(build_pyramid(im, LEVELS)), img)

    pyr0 = tuple(build_pyramid(img, LEVELS))
    pyr1 = tuple(build_pyramid(img2, LEVELS))
    timeit("klt fwd+bwd (all levels)",
           lambda a, b, p, q: forward_backward_track(a, b, p, q, patch=15, iters=10),
           pyr0, pyr1, xy, xy2)
    timeit("orb.describe", orb.describe, pyr1[0], xy)
    timeit("orb.hamming", orb.hamming, desc, desc)
    timeit("undistort", lambda p: undistort_pixels(
        p, (458.7, 457.3, 367.2, 248.4), "radtan",
        (-0.28, 0.07, 0.0, 0.0)), xy)
    timeit("ransac_fundamental",
           lambda a, b, m, k: ransac_fundamental(a, b, m, k, thresh=3e-5),
           uvn, uvn + 0.001, mask, key)
    timeit("detect_grid(occupied)",
           lambda im, oxy, om: detect_grid(im, 3, 8, 10, occupied_xy=oxy,
                                           occupied_mask=om, min_distance=20.0),
           img, xy, mask)
    timeit("detect_grid(no occ)",
           lambda im: detect_grid(im, 3, 8, 10), img)

    tc = TrackerConfig(height=H, width=W, pyramid_levels=LEVELS, capacity=N,
                       equalize=True)
    ts = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    ts1, _ = jax.jit(lambda s, im: process_frame(tc, s, im, 0.05, gyro, Rbc))(ts, img)
    jax.block_until_ready(ts1.xy)
    timeit("process_frame (full)",
           lambda s, im: process_frame(tc, s, im, jnp.asarray(0.10), gyro, Rbc),
           ts1, img2, reps=20)


if __name__ == "__main__":
    main()
