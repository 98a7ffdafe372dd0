"""Round-4 per-component timing of the current frame pipeline on TPU.

MFU measured ~1e-4 (scripts/mfu_e2e.py): the replay is op-count bound, not
compute bound. This times each front-end + filter component standalone
under the anti-dedupe protocol (scripts/bench_proto.py) to rank the
sequential-op-chain targets for fusion.

Run: python scripts/bisect_frame4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_proto import bench_scan_varied

H, W, N = 480, 752, 200
PATCH = 15


def main():
    from orcvio_tpu.config.core import FilterConfig
    from orcvio_tpu.dataio.synthetic import SimConfig, generate
    from orcvio_tpu.filter.pipeline import build_chi2_table, filter_step
    from orcvio_tpu.frontend import orb
    from orcvio_tpu.frontend.detect import detect_grid
    from orcvio_tpu.frontend.image import build_pyramid, equalize_hist
    from orcvio_tpu.frontend.klt import (
        forward_backward_track, gather_level, prepare_pyramid, resample,
    )
    from orcvio_tpu.frontend.ransac import ransac_fundamental
    from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame
    from orcvio_tpu.frontend.undistort import undistort_pixels
    from orcvio_tpu.vio import VioState, vio_step

    rng = np.random.default_rng(0)
    dtype = jnp.float32

    def img_i(i):
        return jnp.asarray(rng.uniform(0, 255, (H, W)), dtype)

    def xy_i(i):
        return jnp.asarray(
            np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], 1),
            dtype)

    # ---- front-end components ----
    bench_scan_varied(jax.jit(equalize_hist), lambda i: (img_i(i),),
                      tag="equalize_hist")
    bench_scan_varied(jax.jit(lambda im: build_pyramid(im, 4)),
                      lambda i: (img_i(i),), tag="build_pyramid(4)")
    prep = jax.jit(lambda im: prepare_pyramid(build_pyramid(im, 4), "f32x2"))
    bench_scan_varied(prep, lambda i: (img_i(i),), tag="pyramid+prepare f32x2")

    pyr0 = prep(img_i(0))
    pyr1 = prep(img_i(1))

    fbt = jax.jit(lambda a, b, x, g: forward_backward_track(
        a, b, x, g, patch=PATCH, iters=10))
    bench_scan_varied(fbt, lambda i: (pyr0, pyr1, xy_i(i), xy_i(i)),
                      tag="forward_backward_track 4lv x10it f32x2")
    fbt5 = jax.jit(lambda a, b, x, g: forward_backward_track(
        a, b, x, g, patch=PATCH, iters=5))
    bench_scan_varied(fbt5, lambda i: (pyr0, pyr1, xy_i(i), xy_i(i)),
                      tag="forward_backward_track 4lv x5it f32x2")
    prep_bf = jax.jit(lambda im: prepare_pyramid(build_pyramid(im, 4), "bf16"))
    pyr0b, pyr1b = prep_bf(img_i(0)), prep_bf(img_i(1))
    fbt_bf = jax.jit(lambda a, b, x, g: forward_backward_track(
        a, b, x, g, patch=PATCH, iters=10, precision="bf16"))
    bench_scan_varied(fbt_bf, lambda i: (pyr0b, pyr1b, xy_i(i), xy_i(i)),
                      tag="forward_backward_track 4lv x10it bf16")

    gl = jax.jit(lambda ai, c: gather_level(ai, c))
    bench_scan_varied(gl, lambda i: (pyr0[0], xy_i(i)), tag="gather_level L0 x1")
    lw = gl(pyr0[0], xy_i(0))
    rs = jax.jit(lambda w, l: resample(w[None], l, PATCH, "f32x2"))
    bench_scan_varied(rs, lambda i: (lw.win, jnp.abs(xy_i(i)) % 20.0),
                      tag="resample 15x15 f32x2 x1")

    bench_scan_varied(
        jax.jit(lambda im, c: detect_grid(im, 3, 8, 10, occupied_xy=c,
                                          occupied_mask=jnp.ones((N,), bool),
                                          min_distance=20.0)),
        lambda i: (img_i(i), xy_i(i)), tag="detect_grid")
    bench_scan_varied(jax.jit(lambda ai, c: orb.describe(ai, c)),
                      lambda i: (pyr0[0], xy_i(i)), tag="orb.describe 200")
    bench_scan_varied(
        jax.jit(lambda a, b: orb.hamming(a, b)),
        lambda i: (jnp.asarray(rng.integers(0, 2**32, (N, 8)), jnp.uint32),
                   jnp.asarray(rng.integers(0, 2**32, (N, 8)), jnp.uint32)),
        tag="orb.hamming")
    bench_scan_varied(
        jax.jit(lambda x: undistort_pixels(x, (458.0, 457.0, 367.0, 248.0),
                                           "radtan", (-0.28, 0.07, 0.0, 0.0))),
        lambda i: (xy_i(i),), tag="undistort 400")
    bench_scan_varied(
        jax.jit(lambda a, b, m, k: ransac_fundamental(a, b, m, k, thresh=3e-5)),
        lambda i: ((xy_i(i) - 300) / 400, (xy_i(i + 100) - 300) / 400,
                   jnp.ones((N,), bool), jax.random.PRNGKey(i)),
        tag="ransac_fundamental")

    # ---- whole tracker step ----
    tc = TrackerConfig(detect_every=2)
    ts0 = TrackerState.create(tc, dtype)

    def tstep(ts, im, t, idx):
        return process_frame(tc, ts, im, t, jnp.zeros(3, dtype),
                             jnp.eye(3, dtype=dtype), frame_idx=idx)[0].xy

    bench_scan_varied(jax.jit(tstep),
                      lambda i: (ts0, img_i(i), jnp.asarray(0.05 * i, dtype),
                                 jnp.asarray(i, jnp.int32)),
                      tag="tracker process_frame (detect frame)")
    bench_scan_varied(jax.jit(tstep),
                      lambda i: (ts0, img_i(i), jnp.asarray(0.05 * i, dtype),
                                 jnp.asarray(2 * i + 1, jnp.int32)),
                      tag="tracker process_frame (no-detect frame)")

    # ---- filter ----
    cfg = FilterConfig(sw_size=20, max_features=150, max_track_len=6,
                       imu_slab=16, observation_noise=0.004,
                       tri_translation_threshold=-1.0)
    sim = SimConfig(n_frames=32, n_landmarks=400, max_obs=60, imu_slab=16,
                    seed=0)
    data = generate(sim)
    chi2 = build_chi2_table(cfg, dtype)
    vs0 = VioState.create(cfg, 60, dtype)

    def fstep(vs, k):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        fr = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype in (jnp.float64, jnp.float32)
            else x, fr)
        vs2, out = vio_step(cfg, vs, fr, chi2)
        return out.p

    bench_scan_varied(jax.jit(fstep),
                      lambda i: (vs0, jnp.asarray(i % 32, jnp.int32)),
                      tag="vio_step sw20 f150 slab16")

    from orcvio_tpu.filter.propagation import imu_batch, imu_batch_transition
    st = VioState.create(cfg, 60, dtype).filter

    def prop(s, k):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        s2 = imu_batch(cfg, s, fr.imu_t.astype(dtype),
                       fr.imu_gyro.astype(dtype), fr.imu_acc.astype(dtype),
                       fr.imu_mask)
        return s2.P

    bench_scan_varied(jax.jit(prop), lambda i: (st, jnp.asarray(i % 32, jnp.int32)),
                      tag="imu_batch slab16 (mean scan + 1 P touch)")

    def prop_t(s, k):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        out = imu_batch_transition(cfg, s, fr.imu_t.astype(dtype),
                                   fr.imu_gyro.astype(dtype),
                                   fr.imu_acc.astype(dtype), fr.imu_mask)
        return out[1]

    bench_scan_varied(jax.jit(prop_t), lambda i: (st, jnp.asarray(i % 32, jnp.int32)),
                      tag="imu_batch_transition only (22x22 scan)")


if __name__ == "__main__":
    main()
