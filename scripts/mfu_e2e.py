"""MFU + per-stage timing of the staged e2e replay on the real chip.

VERDICT r3 asked for measured evidence of WHERE the e2e wall is:
  * compiled FLOPs (XLA cost analysis) / wall time / chip peak = MFU —
    says whether we are compute-bound or dispatch/serial-bound;
  * tracker-only vs filter-only vs full split — says which stage to attack;
  * per-extraction FLOPs of the one-hot window gather — the known
    FLOPs-for-parallelism trade whose regime was unmeasured.

Run: python scripts/mfu_e2e.py [--frames 900] [--batch 1]
Writes a JSON summary line; full numbers to stdout.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax as _jax

_jax.config.update("jax_compilation_cache_dir", "/tmp/orcvio_jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# TPU v5e (v5 lite) peak: 394 TOPS int8, 197 TFLOP/s bf16; f32 via MXU
# passes ~ 1/4 of bf16. cost_analysis flops are precision-blind operation
# counts, so report MFU against the bf16 peak (the optimistic denominator —
# honest MFU is at most this).
PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from orcvio_tpu.config.core import FilterConfig
    from orcvio_tpu.config.yaml_io import load_reference_yaml
    from orcvio_tpu.dataio.native import NativeEurocLoader
    from orcvio_tpu.eval.staged import (
        make_batched_e2e_replay, make_e2e_replay, make_tracker_scan,
        stage_sequence,
    )
    from orcvio_tpu.filter.pipeline import build_chi2_table, filter_step
    from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState
    from orcvio_tpu.vio import VioState, vio_step

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

    R_b2c, t_c_b = np.asarray(cam.R_b2c), np.asarray(cam.t_c_b)
    ts0 = TrackerState.create(tc, dtype)
    vs0 = VioState.create(cfg, tc.capacity, dtype)

    def time_fn(fn, argsets, probe):
        out = fn(*argsets[0])
        jax.block_until_ready(probe(out))
        t0 = time.perf_counter()
        for a in argsets[1:]:
            out = fn(*a)
        jax.block_until_ready(probe(out))
        return (time.perf_counter() - t0) / (len(argsets) - 1)

    def ts_seeded(i):
        return ts0.replace(rng=jax.random.PRNGKey(i))

    results = {}

    # ---- full e2e ----
    if args.batch > 1:
        B = args.batch
        rep = jax.jit(make_batched_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
        sets = [(jax.tree.map(lambda x: jnp.stack([x] * B), ts_seeded(i)),
                 jax.tree.map(lambda x: jnp.stack([x] * B), vs0), staged)
                for i in range(args.reps + 1)]
    else:
        B = 1
        rep = jax.jit(make_e2e_replay(cfg, tc, R_b2c, t_c_b, dtype))
        sets = [(ts_seeded(i), vs0, staged) for i in range(args.reps + 1)]
    lowered = rep.lower(*sets[0])
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", float("nan")))
    dt = time_fn(rep, sets, lambda o: o[1]["p"])
    results["e2e"] = dict(
        s_per_replay=round(dt, 3),
        fps=round(B * n / dt, 1),
        ms_per_frame=round(1e3 * dt / (B * n), 3),
        gflops_total=round(flops / 1e9, 1),
        gflops_per_frame=round(flops / (B * n) / 1e9, 3),
        mfu_vs_bf16_peak=round(flops / dt / PEAK_BF16, 4),
        bytes_accessed_gb=round(float(ca.get("bytes accessed", 0)) / 1e9, 2),
    )
    print(json.dumps({"stage": "e2e", "B": B, **results["e2e"]}), flush=True)

    # ---- tracker-only ----
    tscan = jax.jit(make_tracker_scan(tc, R_b2c, dtype))
    tsets = [(ts_seeded(i), staged) for i in range(args.reps + 1)]
    ca_t = tscan.lower(*tsets[0]).compile().cost_analysis()
    dt_t = time_fn(tscan, tsets, lambda o: o[1].uvs)
    results["tracker"] = dict(
        s_per_replay=round(dt_t, 3),
        ms_per_frame=round(1e3 * dt_t / n, 3),
        gflops_per_frame=round(float(ca_t.get("flops", 0)) / n / 1e9, 3),
        mfu_vs_bf16_peak=round(float(ca_t.get("flops", 0)) / dt_t / PEAK_BF16, 4),
    )
    print(json.dumps({"stage": "tracker", **results["tracker"]}), flush=True)

    # ---- filter-only (on the tracker outputs) ----
    _, frames = tscan(ts0, staged)
    frames = jax.block_until_ready(frames)
    chi2 = build_chi2_table(cfg, dtype)

    def freplay(vs, fr):
        vs = vs.replace(filter=vs.filter.replace(
            R_b2c=jnp.asarray(R_b2c, dtype), t_c_b=jnp.asarray(t_c_b, dtype)))
        def step(s, f):
            s2, out = vio_step(cfg, s, f, chi2)
            return s2, out.p
        return jax.lax.scan(step, vs, fr)

    fjit = jax.jit(freplay)
    fsets = [(vs0, jax.tree.map(lambda x: x + 0 * i if x.dtype != bool else x, frames))
             for i in range(args.reps + 1)]
    ca_f = fjit.lower(*fsets[0]).compile().cost_analysis()
    dt_f = time_fn(fjit, fsets, lambda o: o[1])
    results["filter"] = dict(
        s_per_replay=round(dt_f, 3),
        ms_per_frame=round(1e3 * dt_f / n, 3),
        gflops_per_frame=round(float(ca_f.get("flops", 0)) / n / 1e9, 3),
        mfu_vs_bf16_peak=round(float(ca_f.get("flops", 0)) / dt_f / PEAK_BF16, 4),
    )
    print(json.dumps({"stage": "filter", **results["filter"]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
