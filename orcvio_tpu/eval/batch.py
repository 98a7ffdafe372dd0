"""Batch evaluation: many sequences x config variants -> markdown table.

TPU-native equivalent of ``python_scripts/trajectory_eval/batch_run_euroc.py``
(the serial rosbag loop that produced eval_results/*.md): sequences can be
EuRoC directories (run through the full tracker+filter) or synthetic seeds
(feature replay), and — unlike the reference — batches of sequences can run
data-parallel across devices via parallel/replay.py.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def run_synthetic_case(cfg, sim, dtype=None):
    """One synthetic sequence through the filter; returns metrics dict."""
    import jax
    import jax.numpy as jnp

    from ..dataio.synthetic import generate, trajectory_pose
    from ..filter.pipeline import build_chi2_table, run_sequence
    from ..filter.state import FilterState

    dtype = dtype or jnp.float32
    R_b2c = jnp.asarray([[0.0, -1, 0], [0, 0, -1], [1.0, 0, 0]], dtype)
    t_c_b = jnp.asarray([0.05, 0.02, 0.0], dtype)
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
    frames = jax.tree.map(lambda x: x.astype(dtype) if x.dtype.kind == "f" else x, data.frames)
    st = FilterState.create(cfg, dtype)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0.astype(dtype), p=p0.astype(dtype), v=v0.astype(dtype))
    d = np.asarray(cfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c, t_c_b=t_c_b,
                    P=jnp.asarray(np.diag(d), dtype), initialized=jnp.ones((), bool))
    chi2 = build_chi2_table(cfg, dtype)
    final, outs = run_sequence(cfg, st, frames, chi2)
    err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
    from ..math import so3

    rot_err = []
    for k in range(len(err)):
        Rrel = np.asarray(outs.R[k]).T @ np.asarray(data.gt_R[k])
        rot_err.append(np.degrees(np.linalg.norm(np.asarray(so3.log(Rrel)))))
    return {
        "rmse_pos_m": float(np.sqrt((err**2).mean())),
        "rmse_rot_deg": float(np.sqrt((np.asarray(rot_err) ** 2).mean())),
        "final_err_m": float(err[-1]),
        "updates": int(np.asarray(outs.n_update_features).sum()),
    }


def run_euroc_case(cfg, tc, seq_dir: str, max_frames: int = 0):
    """One EuRoC sequence through the full tracker+filter; returns metrics."""
    from ..dataio.euroc import bin_imu_per_frame, load_euroc
    from ..eval.trajectory import ate
    from ..math import quat
    from ..run_vio import run_image_sequence
    import jax.numpy as jnp
    import jax

    seq = load_euroc(seq_dir)
    imu_t, gyro, acc, mask = bin_imu_per_frame(seq, cfg.imu_slab, cfg.td)
    K = len(seq.cam_t) if not max_frames else min(max_frames, len(seq.cam_t))
    import cv2

    def get_image(k):
        return cv2.imread(seq.image_paths[k], cv2.IMREAD_GRAYSCALE).astype(np.float32)

    res = run_image_sequence(
        cfg, tc, get_image, seq.cam_t[:K], imu_t[:K], gyro[:K], acc[:K], mask[:K],
        np.eye(3), np.zeros(3),
    )
    out = {"fps": res["fps"]}
    if seq.gt_t is not None:
        q = np.stack([np.asarray(quat.from_rotation(jnp.asarray(R))) for R in res["R"]])
        m = ate(res["t"], res["p"], q, seq.gt_t, seq.gt_p, seq.gt_q, alignment="posyaw")
        out.update(rmse_pos_m=m["rmse_trans"], rmse_rot_deg=m["rmse_rot_deg"])
    return out


def markdown_table(results: Dict[str, Dict[str, Dict]], metrics=("rmse_rot_deg", "rmse_pos_m")) -> str:
    """results[variant][sequence] = metrics dict -> reference-style table.

    Mirrors the layout of eval_results/orcvio_vs_larvio/orcvio_vs_larvio_euroc.md:
    one row per variant, one column per sequence holding "rot, pos", plus the
    average.
    """
    variants = list(results)
    seqs = sorted({s for v in results.values() for s in v})
    lines = ["| variant | " + " | ".join(seqs) + " | avg |",
             "|---|" + "---|" * (len(seqs) + 1)]
    for v in variants:
        cells = []
        acc = np.zeros(len(metrics))
        n = 0
        for s in seqs:
            m = results[v].get(s)
            if m is None:
                cells.append("-")
                continue
            vals = [m.get(k, float("nan")) for k in metrics]
            acc += np.asarray(vals)
            n += 1
            cells.append(", ".join(f"{x:.2f}" for x in vals))
        avg = ", ".join(f"{x:.2f}" for x in (acc / max(n, 1)))
        lines.append(f"| {v} | " + " | ".join(cells) + f" | **{avg}** |")
    return "\n".join(lines)


def run_synthetic_batch_vmap(cfg, sims, dtype=None):
    """All sequences through ONE ``vmap(run_sequence)`` dispatch.

    The filter state is a pure pytree with static shapes, so N independent
    sequences batch for free: stack initial states and frame stacks on a
    leading axis and vmap the whole scan. On one chip this amortizes
    dispatch/compile across sequences; over a mesh the same function shards
    with a NamedSharding on the batch axis (parallel/replay.py). The
    reference's evaluator (batch_run_euroc.py) is strictly serial.

    sims: list of SimConfig sharing static shapes (n_frames/max_obs/imu_slab).
    Returns list of per-sequence metric dicts (same schema as
    run_synthetic_case).
    """
    import jax
    import jax.numpy as jnp

    from ..dataio.synthetic import generate, trajectory_pose
    from ..filter.pipeline import build_chi2_table, run_sequence
    from ..filter.state import FilterState
    from ..math import so3

    dtype = dtype or jnp.float32
    R_b2c = jnp.asarray([[0.0, -1, 0], [0, 0, -1], [1.0, 0, 0]], dtype)
    t_c_b = jnp.asarray([0.05, 0.02, 0.0], dtype)

    states, frames_list, gts = [], [], []
    for sim in sims:
        data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
        frames = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype.kind == "f" else x, data.frames
        )
        st = FilterState.create(cfg, dtype)
        R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
        v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
        imu = st.imu.replace(R=R0.astype(dtype), p=p0.astype(dtype), v=v0.astype(dtype))
        d = np.asarray(cfg.initial_cov_diag())
        d[:15] = 1e-6
        st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c, t_c_b=t_c_b,
                        P=jnp.asarray(np.diag(d), dtype), initialized=jnp.ones((), bool))
        states.append(st)
        frames_list.append(frames)
        gts.append((np.asarray(data.gt_p), np.asarray(data.gt_R)))

    st_b = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    fr_b = jax.tree.map(lambda *xs: jnp.stack(xs), *frames_list)
    chi2 = build_chi2_table(cfg, dtype)
    run = jax.jit(jax.vmap(lambda s, f: run_sequence(cfg, s, f, chi2)))
    _, outs = run(st_b, fr_b)

    results = []
    for i, (gt_p, gt_R) in enumerate(gts):
        p = np.asarray(outs.p[i])
        err = np.linalg.norm(p - gt_p, axis=1)
        rot_err = [
            np.degrees(np.linalg.norm(np.asarray(so3.log(jnp.asarray(
                np.asarray(outs.R[i, k]).T @ gt_R[k])))))
            for k in range(len(err))
        ]
        results.append({
            "rmse_pos_m": float(np.sqrt((err**2).mean())),
            "rmse_rot_deg": float(np.sqrt((np.asarray(rot_err) ** 2).mean())),
            "final_err_m": float(err[-1]),
            "updates": int(np.asarray(outs.n_update_features[i]).sum()),
        })
    return results


def batch_run_synthetic(variants: Dict[str, dict], seeds: List[int], base_cfg=None, sim_kw=None,
                        use_vmap: bool = False):
    """Loop variants x seeds (the batch_run_euroc analogue on synthetic data)."""
    from ..config.core import FilterConfig
    from ..dataio.synthetic import SimConfig

    base_cfg = base_cfg or {}
    sim_kw = sim_kw or {}
    results = {}
    for name, overrides in variants.items():
        cfg = FilterConfig(**{**base_cfg, **overrides})
        if use_vmap:
            sims = [SimConfig(**{**sim_kw, "seed": seed}) for seed in seeds]
            per_seq = run_synthetic_batch_vmap(cfg, sims)
            results[name] = {f"seq{s}": m for s, m in zip(seeds, per_seq)}
        else:
            results[name] = {}
            for seed in seeds:
                sim = SimConfig(**{**sim_kw, "seed": seed})
                results[name][f"seq{seed}"] = run_synthetic_case(cfg, sim)
    return results
