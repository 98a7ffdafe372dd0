"""E2E batch-scaling sweep on the chip: aggregate frames/s/chip vs B.

VERDICT r2 asked for the B in {1,2,4,8,16,...} curve to find what (if
anything) still serializes under vmap after the window-gather rewrite.
Timing follows scripts/bench_proto.py: arguments are passed to the jitted
function (no closure constants) and the initial state is varied per rep so
the tunneled platform cannot dedupe bit-identical dispatches.

Run: python scripts/sweep_batch_e2e.py [--frames 900] [--batches 1,2,4,8,16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default=None,
                    help="override tracker klt_precision (f32x2|bf16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from orcvio_tpu.config.core import FilterConfig
    from orcvio_tpu.config.yaml_io import load_reference_yaml
    from orcvio_tpu.dataio.native import NativeEurocLoader
    from orcvio_tpu.eval.staged import make_batched_e2e_replay, stage_sequence
    from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState
    from orcvio_tpu.vio import VioState

    seq_root_full, have = bench.ensure_bench_seq()
    n = min(args.frames, have)
    seq_root = bench.truncate_seq(seq_root_full, n) if have > n else seq_root_full

    dtype = jnp.float32
    cfg0, cam, fe = load_reference_yaml(os.path.join(bench.BENCH_DIR, "config.yaml"))
    cfg = FilterConfig(**{**cfg0.__dict__, "imu_slab": 16})
    tc_kw = dict(
        height=cam.height, width=cam.width, pyramid_levels=fe.pyramid_levels + 1,
        capacity=fe.max_features_num, min_distance=float(fe.min_distance),
        equalize=fe.flag_equalize, K=(cam.fx, cam.fy, cam.cx, cam.cy),
        dist_model=cam.distortion_model, dist_coeffs=tuple(cam.dist_coeffs),
        detect_every=max(1, round(20.0 / fe.pub_frequency)),
    )
    if args.precision:
        tc_kw["klt_precision"] = args.precision
    tc = TrackerConfig(**tc_kw)

    nat = NativeEurocLoader(seq_root)
    imu_t, gyro, acc, mask = nat.bin_imu(16, cfg.td)
    cam_t = nat.cam_t
    images = np.stack([nat.get_image(k).astype(np.uint8) for k in range(n)])
    t_origin = float(cam_t[0]) - 1.0
    cam_t = cam_t - t_origin
    imu_t = imu_t - t_origin * (imu_t != 0.0)
    staged = stage_sequence(images, cam_t[:n], imu_t[:n], gyro[:n], acc[:n],
                            mask[:n], dtype)
    staged = jax.device_put(staged)
    jax.block_until_ready(staged.images)

    R_b2c, t_c_b = np.asarray(cam.R_b2c), np.asarray(cam.t_c_b)
    ts0 = TrackerState.create(tc, dtype)
    vs0 = VioState.create(cfg, tc.capacity, dtype)

    results = {}
    for B in [int(b) for b in args.batches.split(",")]:
        breplay = jax.jit(make_batched_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
        # one state set per rep, each with a distinct RNG seed (anti-dedupe)
        sets = []
        for i in range(args.reps + 1):
            tsb = jax.tree.map(lambda x: jnp.stack([x] * B), ts0)
            tsb = tsb.replace(rng=jax.vmap(jax.random.PRNGKey)(
                jnp.arange(B) + 1000 * i))
            vsb = jax.tree.map(lambda x: jnp.stack([x] * B), vs0)
            sets.append((tsb, vsb))
        sets = jax.block_until_ready(sets)
        t0 = time.perf_counter()
        _, outs = breplay(sets[0][0], sets[0][1], staged)
        jax.block_until_ready(outs["p"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.reps):
            _, outs = breplay(sets[1 + i][0], sets[1 + i][1], staged)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        fps = B * n * args.reps / dt
        results[B] = dict(agg_fps=round(fps, 1), per_seq_fps=round(fps / B, 1),
                          ms_per_frame=round(1e3 * dt / (n * args.reps * B), 3),
                          compile_s=round(compile_s, 1))
        print(json.dumps({"B": B, **results[B]}), flush=True)

    best = max(results, key=lambda b: results[b]["agg_fps"])
    print(json.dumps({"best_B": best, **results[best]}))


if __name__ == "__main__":
    main()
