"""Why doesn't the batched e2e replay scale? Time vmapped process_frame.

Run: python scripts/bisect_batch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame

H, W, N = 480, 752, 200


def bench(tag, fn, *args, reps=20):
    # block on the WHOLE pytree: fencing one leaf assumes all leaves complete
    # with the same executable, which holds today but is fragile
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag:44s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    tc = TrackerConfig(height=H, width=W, pyramid_levels=4, capacity=N,
                       equalize=True, detect_every=2)
    ts = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    idx = jnp.asarray(1, jnp.int32)

    f1 = jax.jit(lambda s, im: process_frame(tc, s, im, 0.10, gyro, Rbc,
                                             frame_idx=idx))
    ts1, _ = f1(ts, img)
    jax.block_until_ready(ts1.xy)
    base = bench("single frame", f1, ts1, img2)

    for B in (2, 4, 8):
        tsb = jax.tree.map(lambda x: jnp.stack([x] * B), ts1)
        fb_shared = jax.jit(jax.vmap(
            lambda s: process_frame(tc, s, img2, 0.10, gyro, Rbc, frame_idx=idx)))
        ms = bench(f"vmap B={B} (shared image)", fb_shared, tsb)
        print(f"    -> {ms / B:.3f} ms/seq ({base / (ms / B):.2f}x eff)")

    for B in (2, 4, 8):
        tsb = jax.tree.map(lambda x: jnp.stack([x] * B), ts1)
        imb = jnp.stack([img2] * B)
        fb = jax.jit(jax.vmap(
            lambda s, im: process_frame(tc, s, im, 0.10, gyro, Rbc, frame_idx=idx)))
        ms = bench(f"vmap B={B} (batched image)", fb, tsb, imb)
        print(f"    -> {ms / B:.3f} ms/seq ({base / (ms / B):.2f}x eff)")


if __name__ == "__main__":
    main()
