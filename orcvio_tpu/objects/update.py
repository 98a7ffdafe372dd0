"""Object-residual EKF update of the sliding-window camera states.

TPU-native equivalent of ``OrcVIO::constructObjectResidualJacobians``
(orcvio.cpp:2017 — map per-frame object residual Jacobians wrt camera pose
into window-state columns through d(campose)/d(imupose)) and
``OrcVIO::removeLostObjects`` (:2154 — nullspace-project the object-state
block out, chi-square gate, then the standard MSCKF update).

Static-shape realization: the reference's row-compaction over "timestamps
found in the window" becomes row masking; unmatched frames contribute exact
zero rows, which are neutral through the nullspace QR, the gate, and the
update (the same invariant the point-feature path relies on).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..filter.state import LEG, FilterState
from ..filter.update import apply_ekf_update
from ..math import linalg, se3
from .lm import EkfExport


def match_timestamps(obj_t, clone_t, clone_valid, tol=1e-6):
    """For each object frame time, the matching clone slot (or -1).

    Ref: std::find over cur_window_timestamps (orcvio.cpp:2074).
    """
    d = jnp.abs(obj_t[:, None] - clone_t[None, :])
    d = jnp.where(clone_valid[None, :], d, jnp.inf)
    slot = jnp.argmin(d, axis=1)
    ok = jnp.min(d, axis=1) < tol
    return jnp.where(ok, slot, -1), ok


def build_object_H(cfg: FilterConfig, state: FilterState, exp: EkfExport, wTc_obj, obj_t):
    """Assemble (H_x, H_f, r) for one object. Ref: constructObjectResidualJacobians.

    wTc_obj: (T, 4, 4) the camera poses the object LM linearized at (the
    reference ships them as se3 logs in valid_camera_pose_mat); obj_t: (T,).
    Returns H_x (M, D), H_f (M, dof_obj), r (M,), row_mask (M,) with
    M = T * (2K + 4).
    """
    T, K, _ = exp.r_feat.shape
    D = state.P.shape[0]
    dof_obj = exp.J_obj_feat.shape[-1]
    slot, matched = match_timestamps(obj_t, state.clones.t, state.clones.valid)

    # d(campose)/d(imupose) per frame from the object's linearization poses
    # (orcvio.cpp:2078-2092)
    R_b2c = state.R_b2c
    t_c_b = state.t_c_b
    R_w2c = jnp.swapaxes(wTc_obj[:, :3, :3], -1, -2)
    t_b_w = jnp.einsum("tij,j->ti", wTc_obj[:, :3, :3], -R_b2c @ t_c_b) + wTc_obj[:, :3, 3]
    dcam = se3.get_cam_wrt_imu_se3_jacobian(
        R_b2c, t_c_b, R_w2c, t_b_w, cfg.use_left_perturbation
    )  # (T, 6, 6)

    # rows per frame: 2K feature rows then 4 bbox rows (orcvio.cpp:2098-2126)
    Jx_feat = jnp.einsum("tkri,tij->tkrj", exp.J_cam_feat, dcam)  # (T, K, 2, 6)
    Jx_bbox = jnp.einsum("tri,tij->trj", exp.J_cam_bbox, dcam)  # (T, 4, 6)

    feat_rows = Jx_feat.reshape(T, 2 * K, 6)
    Hx_frame = jnp.concatenate([feat_rows, Jx_bbox], axis=1)  # (T, 2K+4, 6)
    Hf_frame = jnp.concatenate(
        [exp.J_obj_feat.reshape(T, 2 * K, dof_obj), exp.J_obj_bbox], axis=1
    )
    r_feat, r_bbox = exp.r_feat, exp.r_bbox
    if cfg.object_residual_transport:
        # Transport the residual to the CURRENT clone estimates: the LM
        # linearized at the pose-history snapshots wTc_obj, but the Kalman
        # innovation must be consistent with the state being corrected. With
        # the camera-twist convention of project_object_points_df_camera
        # (left: wTc' = exp(xi) wTc, right: wTc' = wTc exp(xi)),
        # r_now ~= r_lm + J_cam xi with xi = log of the pose increment from
        # the LM pose to the current clone-derived camera pose.
        sw = state.clones.valid.shape[0]
        sl = jnp.clip(slot, 0, sw - 1)
        R_c2w_now = state.clones.R[sl] @ R_b2c.T
        t_c_w_now = state.clones.p[sl] + jnp.einsum(
            "tij,j->ti", state.clones.R[sl], t_c_b)
        wTc_now = se3.make_pose(R_c2w_now, t_c_w_now)
        if cfg.use_left_perturbation:
            inc = jnp.einsum("tij,tjk->tik", wTc_now, se3.inverse_pose(wTc_obj))
        else:
            inc = jnp.einsum("tij,tjk->tik", se3.inverse_pose(wTc_obj), wTc_now)
        xi = se3.log(inc)  # (T, 6)
        xi = jnp.where(matched[:, None], xi, 0.0)
        r_feat = r_feat + jnp.einsum("tkri,ti->tkr", exp.J_cam_feat, xi)
        r_bbox = r_bbox + jnp.einsum("tri,ti->tr", exp.J_cam_bbox, xi)
    r_frame = jnp.concatenate([r_feat.reshape(T, 2 * K), r_bbox], axis=1)

    row_mask_frame = jnp.concatenate(
        [
            jnp.repeat(exp.zs_mask, 2, axis=1),  # (T, 2K)
            jnp.broadcast_to(exp.zb_mask[:, None], (T, 4)),
        ],
        axis=1,
    ) & matched[:, None]

    # scatter the per-frame 6-col blocks into window columns
    M_rows = T * (2 * K + 4)
    Hx = jnp.zeros((T, 2 * K + 4, D), Hx_frame.dtype)
    cols = LEG + 6 * jnp.clip(slot, 0, state.clones.valid.shape[0] - 1)
    col_idx = cols[:, None, None] + jnp.arange(6)[None, None, :]  # (T, 1, 6)
    t_i = jnp.arange(T)[:, None, None]
    r_i = jnp.arange(2 * K + 4)[None, :, None]
    Hx = Hx.at[t_i, r_i, col_idx].set(Hx_frame)

    m = row_mask_frame[..., None]
    Hx = jnp.where(m, Hx, 0.0).reshape(M_rows, D)
    Hf = jnp.where(m, Hf_frame, 0.0).reshape(M_rows, dof_obj)
    # NOTE — deliberate deviation: the object LM exports r = prediction - z
    # (ObjectLM residual convention) while H = J_cam dcam is the derivative of
    # the prediction; the Kalman path (dx = K r, K from H) requires
    # r ~ +H dx, i.e. r = z - prediction. The reference feeds ŷ - z with +H
    # (orcvio.cpp:2098-2126 -> measurementUpdate_msckf), which the
    # linearization probe in tests/test_objects_update.py shows is
    # sign-inconsistent; we negate the residual here.
    r = -jnp.where(row_mask_frame, r_frame, 0.0).reshape(M_rows)
    return Hx, Hf, r, row_mask_frame.reshape(M_rows), jnp.any(matched)


class UpdateDiag(NamedTuple):
    """Per-update diagnostics (all scalars) for triage/observability."""

    gamma: jnp.ndarray  # chi2 statistic r' S^-1 r
    dof: jnp.ndarray  # gating dof (clipped to table)
    threshold: jnp.ndarray  # chi2 table value used
    n_rows: jnp.ndarray  # active residual rows
    n_frames: jnp.ndarray  # object frames matched to window clones
    gate_ok: jnp.ndarray
    dx_clone_p: jnp.ndarray  # norm of clone-position correction
    r_rms: jnp.ndarray  # RMS of active raw residual rows
    rp_rms: jnp.ndarray  # RMS of the nullspace-projected residual
    h_max: jnp.ndarray  # max |H_x| entry (Jacobian scale)


def object_ekf_update(cfg: FilterConfig, state: FilterState, exp: EkfExport, wTc_obj, obj_t, chi2_table):
    """Full object update: build H -> nullspace -> gate -> update.

    Ref: removeLostObjects (orcvio.cpp:2154). Returns (state, used: bool,
    diag: UpdateDiag). Traced under HIGHEST matmul precision for the same
    covariance-stability reason as filter_step."""
    with jax.default_matmul_precision("highest"):
        return _object_ekf_update(cfg, state, exp, wTc_obj, obj_t, chi2_table)


def _object_ekf_update(cfg, state, exp, wTc_obj, obj_t, chi2_table):
    Hx, Hf, r, row_mask, any_match = build_object_H(cfg, state, exp, wTc_obj, obj_t)
    n_rows = jnp.sum(row_mask)
    dof_obj = Hf.shape[1]
    enough = n_rows > dof_obj  # nullspace needs rows > cols

    Hx_p, r_p = linalg.nullspace_project(Hf, Hx, r)

    # gate: dof = rows after the trick (orcvio.cpp:2172)
    sigma_obj = cfg.object_observation_noise or cfg.observation_noise
    sigma2 = sigma_obj**2
    S = Hx_p @ state.P @ Hx_p.T + sigma2 * jnp.eye(Hx_p.shape[0], dtype=state.P.dtype)
    sol = jnp.linalg.solve(S, r_p)
    gamma = jnp.dot(r_p, sol)
    dof = jnp.clip(n_rows - dof_obj, 1, chi2_table.shape[0] - 1)
    gate_ok = gamma < chi2_table[dof]

    finite = jnp.all(jnp.isfinite(Hx_p)) & jnp.all(jnp.isfinite(r_p))
    use = any_match & enough & gate_ok & finite

    # apply_ekf_update assumes R = observation_noise^2 I; whitening-rescale
    # the rows so the effective noise is sigma_obj (exactly equivalent:
    # K(cH, cr, c*sigma) dx == K(H, r, sigma) dx for any c > 0)
    c = cfg.observation_noise / sigma_obj
    new_state, dx = apply_ekf_update(cfg, state, c * Hx_p, c * r_p)
    out = jax.tree.map(lambda a, b: jnp.where(use, a, b), new_state, state)
    T = obj_t.shape[0]
    slot, matched = match_timestamps(obj_t, state.clones.t, state.clones.valid)
    nr = jnp.maximum(n_rows, 1)
    diag = UpdateDiag(
        gamma=gamma, dof=dof, threshold=chi2_table[dof], n_rows=n_rows,
        n_frames=jnp.sum(matched), gate_ok=gate_ok,
        dx_clone_p=jnp.linalg.norm(new_state.clones.p - state.clones.p),
        r_rms=jnp.sqrt(jnp.sum(r**2) / nr),
        rp_rms=jnp.sqrt(jnp.sum(r_p**2) / nr),
        h_max=jnp.max(jnp.abs(Hx_p)),
    )
    return out, use, diag
