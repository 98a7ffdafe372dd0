"""Benchmark: VIO filter replay throughput (frames/s/chip) on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ pipeline stores no absolute throughput number
(BASELINE.md) — it targets real-time EuRoC at 20 Hz and displays live fps;
typical published MSCKF-class C++ backends run O(100) fps on desktop CPUs.
We use 200 fps as the reference-backend estimate for vs_baseline; the raw
frames/s value is the durable metric.
"""
import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 200.0


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from orcvio_tpu.filter.pipeline import filter_step

    dtype = jnp.float32
    cfg, st, frames, chi2 = ge._build(
        dict(sw_size=20, max_features=150, max_track_len=6, imu_slab=12,
             observation_noise=0.004, tri_translation_threshold=-1.0),
        dict(n_frames=200, n_landmarks=400, max_obs=60, imu_slab=12, seed=0),
        dtype,
    )

    def replay(state, seq):
        def step(s, f):
            s2, out = filter_step(cfg, s, f, chi2)
            return s2, out.p

        return jax.lax.scan(step, state, seq)

    replay_j = jax.jit(replay)
    # compile + warm up
    out_state, ps = replay_j(st, frames)
    jax.block_until_ready(ps)

    n_frames = int(frames.t.shape[0])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out_state, ps = replay_j(st, frames)
    jax.block_until_ready(ps)
    dt = (time.perf_counter() - t0) / reps
    fps = n_frames / dt

    print(json.dumps({
        "metric": "vio_filter_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
