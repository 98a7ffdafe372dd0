"""Filter-step cost decomposition on TPU via config-variant scan timing.

Companion to scan_bisect.py (tracker side): times a T-frame filter-only
lax.scan (one dispatch, per-frame varying data) across config variants that
switch off / shrink individual stages, attributing the ~2.6 ms/frame filter
cost (scripts/mfu_e2e.py) to propagation / update machinery / capacity.

Run: python scripts/bisect_filter4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 64


def bench(tag, cfg_kw, sim_kw, reps=3):
    import __graft_entry__ as ge
    from orcvio_tpu.filter.pipeline import build_chi2_table, filter_step

    cfg, st, frames, chi2 = ge._build(cfg_kw, sim_kw, jnp.float32)

    def replay(state, fr):
        def step(s, f):
            s2, out = filter_step(cfg, s, f, chi2)
            return s2, out.p
        return jax.lax.scan(step, state, fr)

    rj = jax.jit(replay)
    sets = []
    for i in range(reps + 1):
        st_i = st.replace(P=st.P + 0.0)
        fr_i = jax.tree.map(
            lambda x: x + (1e-9 * i if x.dtype.kind == "f" else 0), frames)
        sets.append((st_i, fr_i))
    sets = jax.block_until_ready(jax.tree.map(jnp.asarray, sets))
    out = rj(*sets[0])
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for i in range(reps):
        out = rj(*sets[1 + i])
    jax.block_until_ready(out[1])
    ms = (time.perf_counter() - t0) / (reps * T) * 1e3
    print(f"{tag:52s} {ms:8.3f} ms/frame", flush=True)
    return ms


def main():
    base_cfg = dict(sw_size=20, max_features=150, max_track_len=6,
                    imu_slab=16, observation_noise=0.004,
                    tri_translation_threshold=-1.0)
    base_sim = dict(n_frames=T, n_landmarks=400, max_obs=60, imu_slab=16,
                    seed=0)

    bench("full filter sw20 f150 slab16", base_cfg, base_sim)
    bench("  prediction_only (prop+augment)",
          {**base_cfg, "prediction_only": True}, base_sim)
    bench("  slab8", {**base_cfg, "imu_slab": 8},
          {**base_sim, "imu_slab": 8})
    bench("  slab4", {**base_cfg, "imu_slab": 4},
          {**base_sim, "imu_slab": 4})
    bench("  max_update_features 8",
          {**base_cfg, "max_update_features": 8}, base_sim)
    bench("  max_update_features 16",
          {**base_cfg, "max_update_features": 16}, base_sim)
    bench("  update_form information",
          {**base_cfg, "update_form": "information"}, base_sim)
    bench("  sw10", {**base_cfg, "sw_size": 10}, base_sim)
    bench("  features 60", {**base_cfg, "max_features": 60},
          {**base_sim, "max_obs": 40})
    bench("  zupt on", {**base_cfg, "if_zupt": True}, base_sim)


if __name__ == "__main__":
    main()
