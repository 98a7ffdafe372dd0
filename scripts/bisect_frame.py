"""Marginal per-stage cost INSIDE the fused process_frame program.

Monkeypatches each stage to a cheap stub and re-times the whole jitted
process_frame; the delta vs baseline is the stage's true in-program cost
(per-dispatch overhead cancels). Run: python scripts/bisect_frame.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W, N = 480, 752, 200


def time_frame(tag, idx_val=1):
    from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    tc = TrackerConfig(height=H, width=W, pyramid_levels=4, capacity=N,
                       equalize=True, detect_every=2)
    ts = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    fn = jax.jit(lambda s, im, t, i: process_frame(tc, s, im, t, gyro, Rbc,
                                                   frame_idx=i))
    idx = jnp.asarray(idx_val, jnp.int32)
    ts1, _ = fn(ts, img, jnp.asarray(0.05), idx)
    jax.block_until_ready(ts1.xy)
    out = fn(ts1, img2, jnp.asarray(0.10), idx)
    jax.block_until_ready(out[0].xy)
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(ts1, img2, jnp.asarray(0.10), idx)
    jax.block_until_ready(out[0].xy)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag:36s} {ms:7.3f} ms")
    return ms


def main():
    import contextlib

    import orcvio_tpu.frontend.klt as klt
    import orcvio_tpu.frontend.orb as orb
    import orcvio_tpu.frontend.ransac as ransac
    import orcvio_tpu.frontend.tracker as tracker
    import orcvio_tpu.frontend.undistort as undist
    import orcvio_tpu.frontend.image as fimage

    @contextlib.contextmanager
    def patched(*bindings):
        """bindings: (module, attr, stub). Restores on any exception."""
        saved = [(m, a, getattr(m, a)) for m, a, _ in bindings]
        try:
            for m, a, stub in bindings:
                setattr(m, a, stub)
            yield
        finally:
            for m, a, orig in saved:
                setattr(m, a, orig)

    base = time_frame("baseline (detect off this frame)")
    time_frame("baseline (detect ON this frame)", idx_val=0)

    with patched((orb, "describe",
                  lambda img, xy: jnp.zeros((xy.shape[0], 8), jnp.uint32))):
        time_frame("- orb.describe")

    with patched((orb, "hamming",
                  lambda a, b: jnp.zeros((a.shape[0],), jnp.int32))):
        time_frame("- orb.hamming")

    rstub = lambda a, b, m, k, thresh=0.0: (
        jnp.ones((a.shape[0],), bool), jnp.eye(3, dtype=a.dtype))
    with patched((ransac, "ransac_fundamental", rstub),
                 (tracker, "ransac_fundamental", rstub)):
        time_frame("- ransac")

    ustub = lambda xy, K, m, c: xy / 400.0
    with patched((undist, "undistort_pixels", ustub),
                 (tracker, "undistort_pixels", ustub)):
        time_frame("- undistort")

    kstub = lambda p0, p1, xy, g, patch=15, iters=10: \
        klt.KltResult(xy=g, ok=jnp.ones((xy.shape[0],), bool))
    with patched((klt, "forward_backward_track", kstub),
                 (tracker, "forward_backward_track", kstub)):
        time_frame("- klt")

    estub = lambda im: im
    with patched((fimage, "equalize_hist", estub),
                 (tracker, "equalize_hist", estub)):
        time_frame("- equalize")

    def fake_pyr(im, L):
        return [jax.image.resize(im, (im.shape[0] >> l, im.shape[1] >> l),
                                 "nearest") for l in range(L)]
    with patched((fimage, "build_pyramid", fake_pyr),
                 (tracker, "build_pyramid", fake_pyr)):
        time_frame("- pyramid(blur)")


if __name__ == "__main__":
    main()
