"""E2E A/B of filter-config speed levers on the bench sequence (TPU).

Round-5: the filter-side cost scales with max_update_features (the (K*2T)
direct-update dimension); bisect_filter4 measured 0.897 -> 0.553 ms/frame
going 50 -> 8. This runs the FULL e2e replay per variant and reports
fps + ATE so the speed/accuracy trade is committed, not guessed
(measurements/e2e_ab.json).

Run: python scripts/e2e_ab.py [--frames 900]
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
from orcvio_tpu.dataio.euroc import load_euroc
from orcvio_tpu.dataio.native import NativeEurocLoader
from orcvio_tpu.eval.staged import make_e2e_replay, stage_sequence
from orcvio_tpu.eval.trajectory import ate
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState
from orcvio_tpu.math import quat
from orcvio_tpu.vio import VioState

VARIANTS = {
    "base_K32": {},
    "K16": dict(max_update_features=16),
    "K12": dict(max_update_features=12),
    "K16_noLC": dict(max_update_features=16, prune_last_chance=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements", "e2e_ab.json"))
    args = ap.parse_args()

    seq_root_full, have = bench.ensure_bench_seq()
    n = min(args.frames, have)
    seq_root = bench.truncate_seq(seq_root_full, n) if have > n else seq_root_full

    dtype = jnp.float32
    cfg0, cam, fe = load_reference_yaml(os.path.join(bench.BENCH_DIR, "config.yaml"))
    tc = TrackerConfig(
        height=cam.height, width=cam.width, pyramid_levels=fe.pyramid_levels + 1,
        capacity=fe.max_features_num, min_distance=float(fe.min_distance),
        equalize=fe.flag_equalize, K=(cam.fx, cam.fy, cam.cx, cam.cy),
        dist_model=cam.distortion_model, dist_coeffs=tuple(cam.dist_coeffs),
        detect_every=max(1, round(20.0 / fe.pub_frequency)),
    )
    nat = NativeEurocLoader(seq_root)
    imu_t, gyro, acc, mask = nat.bin_imu(16, cfg0.td)
    cam_t = nat.cam_t
    images = np.stack([nat.get_image(k).astype(np.uint8) for k in range(n)])
    t_origin = float(cam_t[0]) - 1.0
    cam_t = cam_t - t_origin
    imu_t = imu_t - t_origin * (imu_t != 0.0)
    staged = stage_sequence(images, cam_t[:n], imu_t[:n], gyro[:n], acc[:n],
                            mask[:n], dtype)
    staged = jax.device_put(staged)
    jax.block_until_ready(staged.images)
    seq = load_euroc(seq_root)
    R_b2c, t_c_b = np.asarray(cam.R_b2c), np.asarray(cam.t_c_b)

    rows = []
    for name, kw in VARIANTS.items():
        cfg = FilterConfig(**{**cfg0.__dict__, "imu_slab": 16, **kw})
        rep = jax.jit(make_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
        vs0 = VioState.create(cfg, tc.capacity, dtype)
        sets = [(TrackerState.create(tc, dtype, seed=i), vs0, staged)
                for i in range(args.reps + 1)]
        t_c0 = time.perf_counter()
        _, outs = rep(*sets[0])
        jax.block_until_ready(outs["p"])
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for i in range(args.reps):
            _, outs = rep(*sets[1 + i])
        jax.block_until_ready(outs["p"])
        dt = (time.perf_counter() - t0) / args.reps
        q = np.stack([np.asarray(quat.from_rotation(jnp.asarray(R)))
                      for R in np.asarray(outs["R"])])
        try:
            m = ate(np.asarray(cam_t[:n]), np.asarray(outs["p"]), q,
                    seq.gt_t - t_origin, seq.gt_p, seq.gt_q, alignment="posyaw")
            a = round(float(m["rmse_trans"]), 4)
        except Exception:  # noqa: BLE001
            a = float("nan")
        row = dict(variant=name, fps=round(n / dt, 1),
                   ms_per_frame=round(dt / n * 1e3, 3), ate_m=a,
                   compile_s=round(compile_s, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"frames": n, "variants": rows}, f, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
