"""Run-noise band for replay ATE — the number behind "within run noise".

Round-4 VERDICT weak #4: ATE drifts (0.0512 -> 0.0651 bench; S1_slow
0.039 -> 0.058 after the Pallas LK kernel) were waved off as "run noise"
with no committed noise measurement. This measures it: the S1_slow
900-frame replay is bit-deterministic for a fixed tracker RNG seed, so the
honest benign-perturbation band is the ATE spread across tracker seeds
(the RANSAC hypothesis sampler is the only stochastic element; detection
and KLT are deterministic). CPU f32 — the same backend/dtype the parity
ladder runs.

Writes measurements/run_noise.json.
Run: python scripts/run_noise.py [--seeds 6] [--seq S1_slow]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/orcvio_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--seq", default="S1_slow")
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "measurements", "run_noise.json"))
    args = ap.parse_args()

    import bench
    from orcvio_tpu.config.core import FilterConfig
    from orcvio_tpu.config.yaml_io import load_reference_yaml
    from orcvio_tpu.dataio.euroc import load_euroc
    from orcvio_tpu.dataio.euroc_writer import write_reference_config
    from orcvio_tpu.dataio.native import NativeEurocLoader
    from orcvio_tpu.dataio.synthetic import SimConfig
    from orcvio_tpu.eval.staged import (load_bench_images, make_e2e_replay,
                                        stage_sequence)
    from orcvio_tpu.eval.trajectory import ate
    from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState
    from orcvio_tpu.math import quat
    from orcvio_tpu.vio import VioState
    from scripts.parity_table import SEQS as SEQ_DEFS, ensure_seq

    root = f"/tmp/orcvio_parity_{args.seq}"
    ensure_seq(args.seq, SEQ_DEFS[args.seq], args.frames)
    cfg_path = os.path.join(root, "config_runnoise.yaml")
    sim = SimConfig(n_frames=args.frames, frame_hz=20.0, imu_hz=200.0,
                    static_time=3.0, ramp_time=1.5, height=4.0,
                    **SEQ_DEFS[args.seq])
    write_reference_config(cfg_path, sim, output_dir="/tmp/refbench_cache/")

    dtype = jnp.float32
    cfg0, cam, fe = load_reference_yaml(cfg_path)
    cfg = FilterConfig(**{**cfg0.__dict__, "imu_slab": 16})
    tc = TrackerConfig(
        height=cam.height, width=cam.width, pyramid_levels=fe.pyramid_levels + 1,
        capacity=fe.max_features_num, min_distance=float(fe.min_distance),
        equalize=fe.flag_equalize, K=(cam.fx, cam.fy, cam.cx, cam.cy),
        dist_model=cam.distortion_model, dist_coeffs=tuple(cam.dist_coeffs),
        detect_every=max(1, round(20.0 / fe.pub_frequency)),
    )
    nat = NativeEurocLoader(root)
    imu_t, gyro, acc, mask = nat.bin_imu(16, cfg.td)
    cam_t = nat.cam_t
    n = args.frames
    images = np.stack([nat.get_image(k).astype(np.uint8) for k in range(n)])
    t_origin = float(cam_t[0]) - 1.0
    cam_t = cam_t - t_origin
    imu_t = imu_t - t_origin * (imu_t != 0.0)
    staged = stage_sequence(images, cam_t[:n], imu_t[:n], gyro[:n], acc[:n],
                            mask[:n], dtype)
    R_b2c, t_c_b = np.asarray(cam.R_b2c), np.asarray(cam.t_c_b)
    replay = jax.jit(make_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
    vs0 = VioState.create(cfg, tc.capacity, dtype)
    seq = load_euroc(root)

    ates = []
    for s in range(args.seeds):
        ts0 = TrackerState.create(tc, dtype, seed=s)
        _, outs = replay(ts0, vs0, staged)
        q = np.stack([np.asarray(quat.from_rotation(jnp.asarray(R)))
                      for R in np.asarray(outs["R"])])
        m = ate(np.asarray(cam_t[:n]), np.asarray(outs["p"]), q,
                seq.gt_t - t_origin, seq.gt_p, seq.gt_q, alignment="posyaw")
        a = round(float(m["rmse_trans"]), 4)
        ates.append(a)
        print(json.dumps({"seed": s, "ate_m": a}), flush=True)

    arr = np.asarray(ates)
    result = {
        "seq": args.seq, "frames": n, "backend": "cpu-f32",
        "perturbation": "tracker RNG seed (RANSAC sampling)",
        "ate_m": ates,
        "mean": round(float(arr.mean()), 4),
        "std": round(float(arr.std()), 4),
        "band_rel": round(float(arr.std() / arr.mean()), 3),
        "min": float(arr.min()), "max": float(arr.max()),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"wrote": args.out, "mean": result["mean"],
                      "std": result["std"]}))


if __name__ == "__main__":
    main()
