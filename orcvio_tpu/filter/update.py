"""MSCKF measurement Jacobians, chi-square gating, and the EKF update.

TPU-native equivalent of ``measurementJacobian_msckf`` (orcvio.cpp:1071),
``featureJacobian_msckf`` (:1171), ``gatingTestFeature`` (:1953) and
``measurementUpdate_msckf`` (:1654): per-(feature, clone) Jacobians are one
broadcasted tensor computation; per-feature nullspace projection is a vmapped
Householder QR; the stacked update compresses with dense QR (the TPU-native
stand-in for the reference's SPQR sparse QR — the matrices are small and
dense-on-MXU wins) and solves S via Cholesky.

Static-shape policy: every feature contributes a fixed (2*SW)-row block; rows
for invalid observations and non-selected features are exact zeros, which are
neutral through QR compression and the S = H P H^T + sigma^2 I solve.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..math import linalg, se3, so3
from .augment import cam_poses, increment_state
from .state import LEG, FilterState


class FeatureJacobians(NamedTuple):
    H: jnp.ndarray  # (F, 2*SW, D) nullspace-projected stacked Jacobian
    r: jnp.ndarray  # (F, 2*SW) projected residual
    dof: jnp.ndarray  # (F,) 2*n_obs - 3
    usable: jnp.ndarray  # (F,) enough rows for the nullspace trick


def measurement_jacobians(cfg: FilterConfig, state: FilterState, p_w, obs_mask):
    """Per-(feature, clone) H_x/H_e/H_f/r. Ref: measurementJacobian_msckf (orcvio.cpp:1071).

    p_w: (F, 3) triangulated positions; obs_mask: (F, SW). Returns
    (H_x (F,SW,2,6), H_e (F,SW,2,6), H_f (F,SW,2,3), r (F,SW,2)).
    """
    cl = state.clones
    R_b2w = cl.R  # (SW, 3, 3)
    t_b_w = cl.p  # (SW, 3)
    R_b2c = state.R_b2c
    t_c_b = state.t_c_b
    R_c2w, t_c_w = cam_poses(state)
    R_w2c = jnp.swapaxes(R_c2w, -1, -2)  # (SW, 3, 3)

    p_c = jnp.einsum("sij,fsj->fsi", R_w2c, p_w[:, None, :] - t_c_w[None])  # (F, SW, 3)
    z_hat = p_c[..., :2] / p_c[..., 2:3]
    r = state.features.uv - z_hat  # (F, SW, 2)

    dz_dpc = se3.project_image_df(p_c)  # (F, SW, 2, 3)

    p_ref = cl.p_fej if cfg.if_fej else t_b_w
    p_bf_w = p_w[:, None, :] - p_ref[None]  # (F, SW, 3)

    if cfg.use_larvio:
        # dpc_dxb = [R_w2c hat(p_bf_w) | -R_w2c] (orcvio.cpp:1148-1151)
        left_blk = jnp.einsum("sij,fsjk->fsik", R_w2c, so3.hat(p_bf_w))
        dpc_dxb = jnp.concatenate([left_blk, -jnp.broadcast_to(R_w2c, left_blk.shape)], axis=-1)
        H_x = dz_dpc @ dpc_dxb
    else:
        # via odot + dcampose_dimupose (orcvio.cpp:1118-1146)
        dcam_dimu = jax.vmap(
            lambda Rw2c_s, tb_s: se3.get_cam_wrt_imu_se3_jacobian(
                R_b2c, t_c_b, Rw2c_s, tb_s, cfg.use_left_perturbation
            )
        )(R_w2c, t_b_w)  # (SW, 6, 6)
        p_w_h = se3.to_homogeneous(p_w)  # (F, 4)
        sel = jnp.concatenate([jnp.eye(3, dtype=p_w.dtype), jnp.zeros((3, 1), p_w.dtype)], axis=1)
        if cfg.use_left_perturbation:
            # [I|0] cTw odot(p_w_h) dcam_dimu
            cTw = se3.make_pose(R_w2c, -jnp.einsum("sij,sj->si", R_w2c, t_c_w))  # (SW,4,4)
            M = jnp.einsum("ij,sjk->sik", sel, cTw)  # (SW, 3, 4)
            base = jnp.einsum("sij,fjk->fsik", M, se3.odot(p_w_h))  # (F, SW, 3, 6)
        else:
            p_c_h = se3.to_homogeneous(p_c)  # (F, SW, 4)
            base = jnp.einsum("ij,fsjk->fsik", sel, se3.odot(p_c_h))
        dpc_dxb = jnp.einsum("fsik,skl->fsil", base, dcam_dimu)
        H_x = -(dz_dpc @ dpc_dxb)

    # extrinsic block (orcvio.cpp:1153-1158)
    dpc_dxe_l = jnp.einsum("sij,fsjk,skl->fsil", R_w2c, so3.hat(p_bf_w), R_b2w) - (
        R_b2c @ so3.hat(t_c_b)
    )
    dpc_dxe = jnp.concatenate(
        [dpc_dxe_l, jnp.broadcast_to(-R_b2c, dpc_dxe_l.shape)], axis=-1
    )
    H_e = dz_dpc @ dpc_dxe
    H_f = dz_dpc @ R_w2c[None]

    m = obs_mask[..., None]
    return (
        jnp.where(m[..., None], H_x, 0.0),
        jnp.where(m[..., None], H_e, 0.0),
        jnp.where(m[..., None], H_f, 0.0),
        jnp.where(m, r, 0.0),
    )


def feature_jacobians(cfg: FilterConfig, state: FilterState, p_w, obs_mask) -> FeatureJacobians:
    """Stack per-clone blocks into dense rows + nullspace-project H_f out.

    Ref: featureJacobian_msckf (orcvio.cpp:1171) + nullspace_project (math_utils.hpp:287).
    """
    F, SW = obs_mask.shape
    D = state.P.shape[0]
    H_x, H_e, H_f, r = measurement_jacobians(cfg, state, p_w, obs_mask)

    H = jnp.zeros((F, SW, 2, D), state.P.dtype)
    # clone columns: place each slot's 2x6 block at its column range via one scatter
    col_idx = LEG + 6 * jnp.arange(SW)
    cols = col_idx[:, None] + jnp.arange(6)[None, :]  # (SW, 6)
    H = H.at[:, jnp.arange(SW)[:, None, None], jnp.arange(2)[None, :, None], cols[:, None, :]].set(H_x)
    H = H.at[..., 15:21].set(H_e)
    if cfg.estimate_td:
        H = H.at[..., 21].set(state.features.uv_vel * obs_mask[..., None])

    Hrows = H.reshape(F, 2 * SW, D)
    Hf_rows = H_f.reshape(F, 2 * SW, 3)
    r_rows = r.reshape(F, 2 * SW)

    n_obs = jnp.sum(obs_mask, axis=1)
    usable = 2 * n_obs > 3  # nullspace needs rows > cols (math_utils.hpp:295)

    Hp, rp = jax.vmap(linalg.nullspace_project)(Hf_rows, Hrows, r_rows)
    return FeatureJacobians(H=Hp, r=rp, dof=2 * n_obs - 3, usable=usable)


def gate_features(cfg: FilterConfig, state: FilterState, fj: FeatureJacobians, chi2_table):
    """Chi-square gating. Ref: gatingTestFeature (orcvio.cpp:1953)."""
    sigma2 = cfg.observation_noise**2
    HP = jnp.einsum("fmd,de->fme", fj.H, state.P)
    S = jnp.einsum("fme,fne->fmn", HP, fj.H) + sigma2 * jnp.eye(fj.H.shape[1], dtype=state.P.dtype)
    sol = jnp.linalg.solve(S, fj.r[..., None])[..., 0]
    gamma = jnp.sum(fj.r * sol, axis=1)
    thresh = chi2_table[jnp.clip(fj.dof, 0, chi2_table.shape[0] - 1)]
    return gamma < thresh


def msckf_update(cfg: FilterConfig, state: FilterState, fj: FeatureJacobians, use_mask):
    """Stacked EKF update. Ref: measurementUpdate_msckf (orcvio.cpp:1654).

    use_mask: (F,) features included. Zero-masked rows ride through QR
    compression and the S-solve untouched (verified in tests).
    """
    F, M, D = fj.H.shape
    sigma2 = cfg.observation_noise**2
    Hm = jnp.where(use_mask[:, None, None], fj.H, 0.0).reshape(F * M, D)
    rm = jnp.where(use_mask[:, None], fj.r, 0.0).reshape(F * M)

    # QR-compress to at most D rows (SPQR equivalent, orcvio.cpp:1664-1683)
    H_thin, r_thin = linalg.qr_compress(Hm, rm)

    S = H_thin @ state.P @ H_thin.T + sigma2 * jnp.eye(H_thin.shape[0], dtype=state.P.dtype)
    # K^T = S^{-1} H P  (LDLT in the reference; Cholesky here)
    chol = jax.scipy.linalg.cho_factor(S, lower=True)
    K_T = jax.scipy.linalg.cho_solve(chol, H_thin @ state.P)
    K = K_T.T
    dx = K @ r_thin

    state = increment_state(cfg, state, dx)
    I_KH = jnp.eye(D, dtype=state.P.dtype) - K @ H_thin
    P = I_KH @ state.P
    P = 0.5 * (P + P.T)
    return state.replace(P=P), dx
