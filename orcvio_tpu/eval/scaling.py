"""Scaling-efficiency harness: weak-scaling of the many-sequence replay.

BASELINE.md demands >= 80% scaling efficiency from 1 chip to 1 host to N
hosts via many-sequence parallel replay. This harness measures it the same
way at every scale: per-device work is held constant (``seqs_per_device``
filter instances replaying a T-frame synthetic sequence) while the device
count grows, so

    efficiency(N) = fps(N) / (N * fps(1)).

The same code path runs on a virtual CPU mesh (``--virtual 8``; how the
repo's CI validates sharding semantics without a pod), a real TPU slice, or a
multi-process DCN cluster (set ORCVIO_COORDINATOR / ORCVIO_NUM_PROCESSES /
ORCVIO_PROCESS_ID on each host — parallel/multihost.py): the jitted program
is identical, only the mesh changes.

Usage: ``python -m orcvio_tpu.eval.scaling [--virtual N] [--devices 1,2,4,8]``
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build(n_frames: int, dtype):
    import jax.numpy as jnp

    from ..config.core import FilterConfig
    from ..dataio.synthetic import SimConfig, generate, initial_state_np
    from ..filter.pipeline import build_chi2_table
    from ..filter.state import FilterState

    cfg = FilterConfig(sw_size=10, max_features=60, max_track_len=6,
                       imu_slab=12, observation_noise=0.004,
                       tri_translation_threshold=-1.0)
    sim = SimConfig(n_frames=n_frames, n_landmarks=200, max_obs=30,
                    imu_slab=12, seed=0)
    np_dtype = np.dtype("float32" if dtype == "float32" else "float64")
    R_b2c = np.asarray([[0., -1., 0.], [0., 0., -1.], [1., 0., 0.]], np_dtype)
    t_c_b = np.asarray([0.05, 0.02, 0.0], np_dtype)
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
    st = FilterState.create_host(cfg, dtype=np_dtype)
    R0, p0, v0 = initial_state_np(sim)
    imu = st.imu.replace(R=R0.astype(np_dtype), p=p0.astype(np_dtype),
                         v=v0.astype(np_dtype))
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c,
                    t_c_b=t_c_b, initialized=np.ones((), bool))
    import jax

    frames = jax.tree.map(
        lambda x: x.astype(np_dtype) if x.dtype.kind == "f" else x, data.frames)
    return cfg, st, frames, build_chi2_table(cfg, np_dtype)


def measure(device_counts, seqs_per_device: int = 2, n_frames: int = 100,
            reps: int = 3, dtype: str = "float32"):
    import jax

    from ..parallel.multihost import local_batch_to_global, maybe_initialize, \
        replicate_to_global
    from ..parallel.replay import make_mesh, shard_batch, sharded_replay_fn

    multihost = maybe_initialize()
    cfg, st, frames, chi2 = _build(n_frames, dtype)
    n_avail = len(jax.devices())
    if multihost:
        # a mesh must span every process's devices; measure the full cluster
        # (the launcher compares against a separately-run 1-process baseline)
        device_counts = [n_avail]
    else:
        device_counts = [n for n in device_counts if n <= n_avail]

    results = []
    for n_dev in device_counts:
        B = n_dev * seqs_per_device
        B_local = B // jax.process_count()
        mesh = make_mesh(n_dev)
        states = jax.tree.map(lambda x: np.broadcast_to(
            np.asarray(x), (B_local,) + np.asarray(x).shape).copy(), st)
        seqs = jax.tree.map(lambda x: np.broadcast_to(
            np.asarray(x), (B_local,) + np.asarray(x).shape).copy(), frames)
        if multihost:
            states = local_batch_to_global(states, mesh)
            seqs = local_batch_to_global(seqs, mesh)
            (chi2_g,) = replicate_to_global((chi2,), mesh)
        else:
            states = shard_batch(states, mesh)
            seqs = shard_batch(seqs, mesh)
            chi2_g = chi2
        fn = sharded_replay_fn(cfg, mesh)
        compiled = fn.lower(states, seqs, chi2_g).compile()
        hlo = compiled.as_text()
        n_collectives = sum(hlo.count(op) for op in
                            ("all-reduce", "all-gather", "collective-permute",
                             "all-to-all", "reduce-scatter"))
        out_states, outs = fn(states, seqs, chi2_g)  # compile + warm
        jax.block_until_ready(out_states.P)
        t0 = time.perf_counter()
        for _ in range(reps):
            out_states, outs = fn(states, seqs, chi2_g)
        jax.block_until_ready(out_states.P)
        fps = B * n_frames * reps / (time.perf_counter() - t0)
        results.append({"devices": n_dev, "batch": B, "fps": round(fps, 1),
                        "hot_loop_collectives": n_collectives})

    base = results[0]
    for r in results:
        r["efficiency"] = round(
            r["fps"] / (r["devices"] / base["devices"] * base["fps"]), 3)
    return {"weak_scaling": results,
            "scaling_efficiency": results[-1]["efficiency"],
            "multihost": multihost, "n_devices_available": n_avail}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (validates sharding without a pod)")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--seqs-per-device", type=int, default=2)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args(argv)

    if args.virtual:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax

        # the axon env var overrides JAX_PLATFORMS; pin via config
        jax.config.update("jax_platforms", "cpu")

    out = measure([int(x) for x in args.devices.split(",")],
                  seqs_per_device=args.seqs_per_device,
                  n_frames=args.frames, dtype=args.dtype)
    import jax

    if getattr(jax, "process_index", lambda: 0)() == 0:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
