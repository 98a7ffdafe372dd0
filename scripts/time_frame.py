"""Minimal process_frame timer for perf bisection. Run: python scripts/time_frame.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame

H, W, N = 480, 752, 200


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    tc = TrackerConfig(height=H, width=W, pyramid_levels=4, capacity=N,
                       equalize=True)
    ts = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    fn = jax.jit(lambda s, im, t: process_frame(tc, s, im, t, gyro, Rbc))
    ts1, _ = fn(ts, img, jnp.asarray(0.05))
    jax.block_until_ready(ts1.xy)
    out = fn(ts1, img2, jnp.asarray(0.10))
    jax.block_until_ready(out[0].xy)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(ts1, img2, jnp.asarray(0.10))
    jax.block_until_ready(out[0].xy)
    print(f"process_frame: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
