"""Trajectory evaluation: ATE with SE(3)/Sim(3)/yaw alignment + relative error.

TPU-native equivalent of the reference's evaluation stack
(``python_scripts/trajectory_eval/traj_eval.py`` wrapping
rpg_trajectory_evaluation, and the online RMSE accumulation in
``ros_wrapper/src/orcvio/src/System.cpp:918-940``): Umeyama alignment +
ATE/RPE computed host-side with numpy (evaluation is not a hot path).
"""
from __future__ import annotations

import numpy as np


def _quat_to_R(q_xyzw):
    x, y, z, w = np.moveaxis(np.asarray(q_xyzw), -1, 0)
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def associate(t_est, t_gt, max_dt=0.02):
    """Nearest-timestamp association; returns (idx_est, idx_gt)."""
    j = np.searchsorted(t_gt, t_est)
    j = np.clip(j, 1, len(t_gt) - 1)
    left = t_est - t_gt[j - 1]
    right = t_gt[j] - t_est
    jj = np.where(left < right, j - 1, j)
    ok = np.abs(t_gt[jj] - t_est) <= max_dt
    return np.nonzero(ok)[0], jj[ok]


def umeyama(src, dst, with_scale=False):
    """Least-squares similarity transform dst ~ s R src + t (Umeyama 1991)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    if with_scale:
        var = (sc**2).sum() / len(src)
        s = np.trace(np.diag(S) @ D) / var
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def align_yaw_only(src, dst):
    """Position + yaw alignment (the gravity-aligned VIO-standard 4-DoF)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    # yaw from xy cross-correlation
    c = (sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0]).sum()
    s_ = (sc[:, 0] * dc[:, 0] + sc[:, 1] * dc[:, 1]).sum()
    yaw = np.arctan2(c, s_)
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    t = mu_d - R @ mu_s
    return 1.0, R, t


def ate(t_est, p_est, q_est, t_gt, p_gt, q_gt, alignment="se3", max_dt=0.02):
    """Absolute trajectory error after alignment.

    alignment: "se3" | "sim3" | "posyaw" | "none". Returns dict with
    position RMSE (m), rotation RMSE (deg), matched count.
    """
    ie, ig = associate(np.asarray(t_est), np.asarray(t_gt), max_dt)
    if len(ie) < 3:
        raise ValueError(f"too few associations: {len(ie)}")
    pe = np.asarray(p_est)[ie]
    pg = np.asarray(p_gt)[ig]
    if alignment == "se3":
        s, R, t = umeyama(pe, pg, with_scale=False)
    elif alignment == "sim3":
        s, R, t = umeyama(pe, pg, with_scale=True)
    elif alignment == "posyaw":
        s, R, t = align_yaw_only(pe, pg)
    else:
        s, R, t = 1.0, np.eye(3), np.zeros(3)
    pe_a = (s * (R @ pe.T)).T + t
    e_trans = np.linalg.norm(pe_a - pg, axis=1)

    Re = _quat_to_R(np.asarray(q_est)[ie])
    Rg = _quat_to_R(np.asarray(q_gt)[ig])
    Rel = np.einsum("nij,nkj->nik", R @ Re, Rg)  # (R R_e) R_g^T
    tr = np.clip((np.trace(Rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    e_rot = np.degrees(np.arccos(tr))

    return {
        "rmse_trans": float(np.sqrt((e_trans**2).mean())),
        "rmse_rot_deg": float(np.sqrt((e_rot**2).mean())),
        "mean_trans": float(e_trans.mean()),
        "median_trans": float(np.median(e_trans)),
        "n_matched": int(len(ie)),
        "scale": float(s),
    }


def relative_errors(t_est, p_est, t_gt, p_gt, distances=(8.0, 16.0, 24.0, 32.0), max_dt=0.02):
    """KITTI-style relative translation error (%) over sub-trajectory lengths."""
    ie, ig = associate(np.asarray(t_est), np.asarray(t_gt), max_dt)
    pe = np.asarray(p_est)[ie]
    pg = np.asarray(p_gt)[ig]
    dist = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(pg, axis=0), axis=1))])
    out = {}
    for d in distances:
        errs = []
        for i in range(len(pg)):
            j = np.searchsorted(dist, dist[i] + d)
            if j >= len(pg):
                break
            rel_est = pe[j] - pe[i]
            rel_gt = pg[j] - pg[i]
            errs.append(np.linalg.norm(rel_est - rel_gt) / max(d, 1e-9) * 100.0)
        if errs:
            out[d] = float(np.mean(errs))
    return out
