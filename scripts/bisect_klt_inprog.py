"""KLT cost INSIDE process_frame as a function of iters/levels/fb.

Run: python scripts/bisect_klt_inprog.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import orcvio_tpu.frontend.klt as klt
import orcvio_tpu.frontend.tracker as tracker
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame

H, W, N = 480, 752, 200


def time_frame(tag, tc, reps=30):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    ts = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    fn = jax.jit(lambda s, im, t, i: process_frame(tc, s, im, t, gyro, Rbc,
                                                   frame_idx=i))
    idx = jnp.asarray(1, jnp.int32)
    ts1, _ = fn(ts, img, jnp.asarray(0.05), idx)
    jax.block_until_ready(ts1.xy)
    out = fn(ts1, img2, jnp.asarray(0.10), idx)
    jax.block_until_ready(out[0].xy)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ts1, img2, jnp.asarray(0.10), idx)
    jax.block_until_ready(out[0].xy)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag:52s} {ms:7.3f} ms")
    return ms


def main():
    base = dict(height=H, width=W, capacity=N, equalize=True, detect_every=2)
    time_frame("baseline L=4 iters=10", TrackerConfig(pyramid_levels=4, **base))
    time_frame("L=4 iters=5", TrackerConfig(pyramid_levels=4, klt_iters=5, **base))
    time_frame("L=4 iters=2", TrackerConfig(pyramid_levels=4, klt_iters=2, **base))
    time_frame("L=4 iters=1", TrackerConfig(pyramid_levels=4, klt_iters=1, **base))
    time_frame("L=2 iters=10", TrackerConfig(pyramid_levels=2, **base))
    time_frame("L=1 iters=10", TrackerConfig(pyramid_levels=1, **base))

    # no backward pass
    orig = klt.forward_backward_track
    def fwd_only(p0, p1, xy, g, patch=15, iters=10):
        return klt.pyr_track(p0, p1, xy, g, patch, iters)
    klt.forward_backward_track = fwd_only
    tracker.forward_backward_track = fwd_only
    time_frame("L=4 iters=10 fwd-only", TrackerConfig(pyramid_levels=4, **base))
    klt.forward_backward_track = orig
    tracker.forward_backward_track = orig

    # capacity sweep
    for cap in (100, 200, 256, 400):
        b2 = dict(base, capacity=cap)
        time_frame(f"L=4 iters=10 capacity={cap}", TrackerConfig(pyramid_levels=4, **b2))


if __name__ == "__main__":
    main()
