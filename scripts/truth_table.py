"""The front-end cost truth table under the varied-args scan protocol.

Run: python scripts/truth_table.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_proto import bench_scan_varied
from orcvio_tpu.frontend import klt, tracker
from orcvio_tpu.frontend.image import build_pyramid
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState
from orcvio_tpu.ops.window_extract import padded_windows

H, W, N, T = 480, 752, 200, 30
RNG = np.random.default_rng(0)
BASE = RNG.uniform(0, 255, (T + 1, H, W)).astype(np.float32)


def mk_imgs(i):
    return BASE + np.float32(0.01 * i)


def bench_level(tag, level_fn, reps=4):
    xy0 = jnp.asarray(RNG.uniform(40, 400, (N, 2)), jnp.float32)

    def step(xy, pair):
        img0, img1 = pair
        out = level_fn(img0, img1, xy)
        newxy = out if (hasattr(out, "shape") and out.shape == (N, 2)) else \
            xy + 0.001 * jnp.mean(out) * jnp.ones((N, 2))
        return jnp.clip(newxy, 40.0, 400.0), jnp.sum(newxy)

    f = jax.jit(lambda xy, ims: jax.lax.scan(step, xy, (ims[:-1], ims[1:])))
    return bench_scan_varied(f, lambda i: (xy0, mk_imgs(i)), reps=reps,
                             steps=T, tag=tag)


def main():
    bench_level("baseline: near-empty body",
                lambda i0, i1, xy: xy + 1e-6 * i1[0, 0])
    bench_level("extraction only (padded_windows 35x35)",
                lambda i0, i1, xy: jnp.sum(
                    padded_windows(i1[None], jnp.round(xy), -17, 35)[0] ** 2
                ) * jnp.ones((1,)))
    bench_level("track_level (10 iters)",
                lambda i0, i1, xy: klt.track_level(i0, i1, xy, xy, 15, 10, 0.01)[0])
    bench_level("track_level (3 iters)",
                lambda i0, i1, xy: klt.track_level(i0, i1, xy, xy, 15, 3, 0.01)[0])

    def pyr_fb(i0, i1, xy):
        p0 = tuple(build_pyramid(i0, 4))
        p1 = tuple(build_pyramid(i1, 4))
        return klt.forward_backward_track(p0, p1, xy, xy).xy
    bench_level("2 pyramids + forward_backward (8 passes)", pyr_fb)

    def pyr_only(i0, i1, xy):
        return sum(jnp.sum(l * l) for l in build_pyramid(i1, 4)) * jnp.ones((1,))
    bench_level("1 pyramid build only", pyr_only)

    # full process_frame in scan, varied images
    tc = TrackerConfig(height=H, width=W, pyramid_levels=4, capacity=N,
                       equalize=True, detect_every=2)
    ts0 = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    times = jnp.arange(T, dtype=jnp.float32) * 0.05 + 0.05

    def pstep(ts, xs):
        img, t, idx = xs
        ts, out = tracker.process_frame(tc, ts, img, t, gyro, Rbc, frame_idx=idx)
        return ts, out.uvs

    f = jax.jit(lambda ts, ims, tms: jax.lax.scan(
        pstep, ts, (ims[:-1], tms, jnp.arange(T, dtype=jnp.int32))))
    bench_scan_varied(f, lambda i: (ts0, mk_imgs(i), times), reps=4, steps=T,
                      tag="process_frame full")


if __name__ == "__main__":
    main()
