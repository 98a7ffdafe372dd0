"""MSCKF measurement Jacobians, chi-square gating, and the EKF update.

TPU-native equivalent of ``measurementJacobian_msckf`` (orcvio.cpp:1071),
``featureJacobian_msckf`` (:1171), ``gatingTestFeature`` (:1953) and
``measurementUpdate_msckf`` (:1654): per-(feature, observation) Jacobians are
one broadcasted tensor computation over compacted tracks (F, T<=max_track_len
— see tracks.py); per-feature nullspace projection is a vmapped Householder
QR; the stacked update compresses with dense QR (the TPU-native stand-in for
the reference's SPQR sparse QR — the matrices are small and dense-on-MXU wins)
and solves S via Cholesky.

Static-shape policy: every feature contributes a fixed (2*T)-row block; rows
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
from .tracks import CompactTracks


class FeatureJacobians(NamedTuple):
    H: jnp.ndarray  # (F, 2*T, D) nullspace-projected stacked Jacobian
    r: jnp.ndarray  # (F, 2*T) projected residual
    dof: jnp.ndarray  # (F,) 2*n_obs - 3
    usable: jnp.ndarray  # (F,) enough rows for the nullspace trick
    H_raw: jnp.ndarray  # (F, 2*T, D) unprojected rows (for EKF promotion)
    Hf_raw: jnp.ndarray  # (F, 2*T, 3) feature-position block (world frame)
    r_raw: jnp.ndarray  # (F, 2*T)


def measurement_jacobians(cfg: FilterConfig, state: FilterState, ct: CompactTracks, p_w):
    """Per-(feature, obs) H_x/H_e/H_f/r. Ref: measurementJacobian_msckf (orcvio.cpp:1071).

    p_w: (F, 3) triangulated positions. Returns
    (H_x (F,T,2,6), H_e (F,T,2,6), H_f (F,T,2,3), r (F,T,2)).
    """
    R_b2c = state.R_b2c
    t_c_b = state.t_c_b
    R_c2w_all, t_c_w_all = cam_poses(state)
    R_b2w = state.clones.R[ct.slot]  # (F, T, 3, 3)
    t_b_w = state.clones.p[ct.slot]  # (F, T, 3)
    R_c2w = R_c2w_all[ct.slot]
    t_c_w = t_c_w_all[ct.slot]
    R_w2c = jnp.swapaxes(R_c2w, -1, -2)

    p_c = jnp.einsum("ftij,ftj->fti", R_w2c, p_w[:, None, :] - t_c_w)  # (F, T, 3)
    z_hat = p_c[..., :2] / p_c[..., 2:3]
    r = ct.uv - z_hat  # (F, T, 2)

    dz_dpc = se3.project_image_df(p_c)  # (F, T, 2, 3)

    p_ref = state.clones.p_fej[ct.slot] if cfg.if_fej else t_b_w
    p_bf_w = p_w[:, None, :] - p_ref  # (F, T, 3)

    if cfg.use_larvio:
        # dpc_dxb = [R_w2c hat(p_bf_w) | -R_w2c] (orcvio.cpp:1148-1151)
        left_blk = R_w2c @ so3.hat(p_bf_w)
        dpc_dxb = jnp.concatenate([left_blk, -R_w2c], axis=-1)
        H_x = dz_dpc @ dpc_dxb
    else:
        # via odot + dcampose_dimupose (orcvio.cpp:1118-1146)
        dcam_dimu = se3.get_cam_wrt_imu_se3_jacobian(
            R_b2c, t_c_b, R_w2c, t_b_w, cfg.use_left_perturbation
        )  # broadcasting: (F, T, 6, 6)
        sel = jnp.concatenate([jnp.eye(3, dtype=p_w.dtype), jnp.zeros((3, 1), p_w.dtype)], axis=1)
        if cfg.use_left_perturbation:
            p_w_h = se3.to_homogeneous(p_w)  # (F, 4)
            cTw = se3.make_pose(R_w2c, -jnp.einsum("ftij,ftj->fti", R_w2c, t_c_w))
            M = jnp.einsum("ij,ftjk->ftik", sel, cTw)  # (F, T, 3, 4)
            base = jnp.einsum("ftij,fjk->ftik", M, se3.odot(p_w_h))  # (F, T, 3, 6)
        else:
            p_c_h = se3.to_homogeneous(p_c)  # (F, T, 4)
            base = jnp.einsum("ij,ftjk->ftik", sel, se3.odot(p_c_h))
        dpc_dxb = base @ dcam_dimu
        H_x = -(dz_dpc @ dpc_dxb)

    # extrinsic block (orcvio.cpp:1153-1158)
    dpc_dxe_l = R_w2c @ so3.hat(p_bf_w) @ R_b2w - (R_b2c @ so3.hat(t_c_b))
    dpc_dxe = jnp.concatenate(
        [dpc_dxe_l, jnp.broadcast_to(-R_b2c, dpc_dxe_l.shape)], axis=-1
    )
    H_e = dz_dpc @ dpc_dxe
    H_f = dz_dpc @ R_w2c

    m = ct.mask[..., None]
    return (
        jnp.where(m[..., None], H_x, 0.0),
        jnp.where(m[..., None], H_e, 0.0),
        jnp.where(m[..., None], H_f, 0.0),
        jnp.where(m, r, 0.0),
    )


def feature_jacobians(cfg: FilterConfig, state: FilterState, ct: CompactTracks, p_w) -> FeatureJacobians:
    """Stack per-obs blocks into dense rows + nullspace-project H_f out.

    Ref: featureJacobian_msckf (orcvio.cpp:1171) + nullspace_project (math_utils.hpp:287).
    """
    F, T = ct.mask.shape
    D = state.P.shape[0]
    H_x, H_e, H_f, r = measurement_jacobians(cfg, state, ct, p_w)

    # Place each obs's 2x6 clone block at columns LEG + 6*slot via a one-hot
    # matmul instead of a scatter: the batched dynamic-update-slice this
    # lowers to measured ~0.6 ms/frame; the (2,6)@(6,D) one-hot contraction
    # is a fused MXU batch-matmul. Clone columns start at LEG (=22) so they
    # never overlap the static extrinsic (15:21) / td (21) columns, making
    # the adds exact equivalents of the scatters.
    dtype = state.P.dtype
    d_iota = jnp.arange(D)
    col0 = LEG + 6 * ct.slot  # (F, T)
    onehot = (d_iota[None, None, None, :]
              == col0[..., None, None] + jnp.arange(6)[:, None]).astype(dtype)
    H = jnp.einsum("ftrj,ftjd->ftrd", H_x, onehot)
    E6 = (jnp.arange(15, 21)[:, None] == d_iota[None, :]).astype(dtype)  # (6, D)
    H = H + jnp.einsum("ftrj,jd->ftrd", H_e, E6)
    if cfg.estimate_td:
        H = H + (ct.uv_vel * ct.mask[..., None])[..., None] * (d_iota == 21)

    Hrows = H.reshape(F, 2 * T, D)
    Hf_rows = H_f.reshape(F, 2 * T, 3)
    r_rows = r.reshape(F, 2 * T)

    usable = 2 * ct.n_obs > 3  # nullspace needs rows > cols (math_utils.hpp:295)
    Hp, rp = jax.vmap(linalg.nullspace_project)(Hf_rows, Hrows, r_rows)
    return FeatureJacobians(
        H=Hp, r=rp, dof=2 * ct.n_obs - 3, usable=usable,
        H_raw=Hrows, Hf_raw=Hf_rows, r_raw=r_rows,
    )


def gate_features(cfg: FilterConfig, state: FilterState, fj: FeatureJacobians, chi2_table):
    """Chi-square gating. Ref: gatingTestFeature (orcvio.cpp:1953)."""
    sigma2 = cfg.observation_noise**2
    HP = jnp.einsum("fmd,de->fme", fj.H, state.P)
    S = jnp.einsum("fme,fne->fmn", HP, fj.H) + sigma2 * jnp.eye(fj.H.shape[1], dtype=state.P.dtype)
    # unrolled bordered elimination: no batched-Cholesky custom call
    gamma = linalg.chi2_gamma(S, fj.r)
    thresh = chi2_table[jnp.clip(fj.dof, 0, chi2_table.shape[0] - 1)]
    return gamma < thresh


def information_update(cfg: FilterConfig, state: FilterState, Lam, b):
    """EKF update from the information pair (exact given R = sigma^2 I).

    Matrix-inversion-lemma form: with Lam_s = Lambda / sigma^2,
        M  = I + P Lam_s            (nonsingular for any PSD P, Lambda)
        P' = M^{-1} P,   dx = M^{-1} P b / sigma^2.
    No factorization of the (usually rank-deficient) Lambda is needed — no
    ridge, no fake information, exact up to the LU solve. This is the
    MXU-native alternative to the tall-skinny QR compression (ROADMAP
    hotspot #7): Lambda/b are pure matmuls and the only sequential op is one
    D x D LU. It is also the reduction the feature-parallel shard_map path
    psums over devices.

    The LU runs on a Jacobi-normalized M: an f32 TPU replay can leave P with
    small negative eigenvalues (matmul roundoff), and column scales of M vary
    with the information content; partial-pivoted LU on the normalized system
    stays finite and accurate where a Cholesky would NaN.
    """
    D = state.P.shape[0]
    dtype = state.P.dtype
    sigma2 = cfg.observation_noise**2
    M = jnp.eye(D, dtype=dtype) + state.P @ (Lam / sigma2)
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(M)), 1e-30))
    Mn = M / (d[:, None] * d[None, :])
    # M = D Mn D with D = diag(d)  =>  x = D^-1 Mn^-1 D^-1 rhs
    rhs = jnp.concatenate([state.P @ (b / sigma2)[:, None], state.P], axis=1)
    sol = jnp.linalg.solve(Mn, rhs / d[:, None]) / d[:, None]
    dx = sol[:, 0]
    Pn = sol[:, 1:]
    state = increment_state(cfg, state, dx)
    return state.replace(P=0.5 * (Pn + Pn.T)), dx


def apply_ekf_update(cfg: FilterConfig, state: FilterState, H, r):
    """Generic stacked EKF update: compress + Kalman gain + covariance.

    Ref: measurementUpdate_msckf (orcvio.cpp:1654). Two compression forms:
     * "qr" — dense QR stands in for SPQR (:1664-1683); K^T = S^{-1} H P via
       Cholesky (LDLT there); Joseph-free (I-KH)P with re-symmetrization,
       exactly as the reference.
     * "information" — Lambda = H^T H / b = H^T r then information_update;
       all-matmul (MXU) with only D x D factorizations. Equal to "qr" up to
       the rank-deficiency ridge (tests pin the equivalence). Not combined
       with Schmidt (the nuisance gain zeroing needs the explicit row form).
    """
    D = state.P.shape[0]
    sigma2 = cfg.observation_noise**2
    if cfg.update_form == "information" and not (
            cfg.use_schmidt and cfg.nuisance_cap > 0):
        return information_update(cfg, state, H.T @ H, H.T @ r)
    if cfg.update_form == "chol":
        # Gram-Cholesky compression: same Gram invariants as QR (R factor up
        # to row signs for full rank) without the tall blocked-QR custom call.
        # NB measured NaN-prone on long f32 replays (interior near-rank-
        # deficiency of H^T H); kept for A/B, not a default candidate.
        H_thin, r_thin = linalg.chol_compress(H, r)
    elif cfg.update_form == "direct":
        # no compression at all: the textbook stacked update. Zero (padded)
        # rows decouple exactly in S = H P H^T + sigma^2 I (identity rows,
        # zero gain), so this equals the compressed update in exact
        # arithmetic while dropping the tall-QR custom call; the bigger
        # (m x m) Cholesky is one MXU-friendly blocked factorization.
        # NB: S is (m x m) with m = 2*max_update_features*max_track_len, so
        # cost grows O(m^3); measured faster than "qr" at default sizes
        # (m<=384) but "qr" wins when m >> D (see config/core.py).
        H_thin, r_thin = H, r
    elif cfg.update_form in ("qr", "information"):
        # ("information" + Schmidt lands here: the nuisance gain zeroing
        # needs the explicit row form, so it runs the qr-compressed update.)
        H_thin, r_thin = linalg.qr_compress(H, r)
    else:
        raise ValueError(
            f"unknown update_form {cfg.update_form!r}: expected one of "
            "'direct', 'qr', 'information', 'chol'")
    S = H_thin @ state.P @ H_thin.T + sigma2 * jnp.eye(H_thin.shape[0], dtype=state.P.dtype)
    chol = jax.scipy.linalg.cho_factor(S, lower=True)
    K_T = jax.scipy.linalg.cho_solve(chol, H_thin @ state.P)
    K = K_T.T
    schmidt = cfg.use_schmidt and cfg.nuisance_cap > 0
    ref_schmidt = schmidt and cfg.schmidt_reference_semantics
    if schmidt and not ref_schmidt:
        # textbook Schmidt: nuisance rows get no correction, keeping P_nn
        # frozen and the cross-covariance consistent with the zero gain
        nb = D - 6 * cfg.nuisance_cap
        K = K.at[nb:].set(0.0)
    dx = K @ r_thin
    state = increment_state(cfg, state, dx)
    I_KH = jnp.eye(D, dtype=state.P.dtype) - K @ H_thin
    if ref_schmidt:
        # reference semantics (orcvio.cpp:1741-1756): full-gain (I-KH)P,
        # restore the old nuisance diagonal block, then symmetrize — the
        # averaging halves the one-sided cross-covariance update. The mean
        # increments are identical either way (nuisance means are frozen and
        # the active rows of K do not depend on K_n).
        nb = D - 6 * cfg.nuisance_cap
        P_nn = state.P[nb:, nb:]
        P = I_KH @ state.P
        P = P.at[nb:, nb:].set(P_nn)
    elif cfg.joseph_form and not schmidt:
        # Joseph stabilized form: PSD for ANY gain, so asymmetric f32
        # roundoff cannot push P indefinite on long horizons (the economical
        # form below diverges at ~3600 frames in f32; config comment).
        P = I_KH @ state.P @ I_KH.T + sigma2 * (K @ K.T)
    else:
        P = I_KH @ state.P
        if schmidt:
            nb = D - 6 * cfg.nuisance_cap
            # nuisance rows kept old P_na; mirror the updated active-nuisance
            # cross block for exact symmetry
            P = P.at[nb:, :nb].set(P[:nb, nb:].T)
    P = 0.5 * (P + P.T)
    return state.replace(P=P), dx


def msckf_update(cfg: FilterConfig, state: FilterState, fj: FeatureJacobians, use_mask):
    """Stacked point-feature EKF update. Ref: measurementUpdate_msckf (orcvio.cpp:1654).

    use_mask: (F,) features included. Only a handful of features finish per
    frame, so the stack is first compacted to the top max_update_features
    rows by mask (gather); zero rows from the remaining padding ride through
    QR compression and the S-solve untouched (verified in tests).
    """
    F, M, D = fj.H.shape
    K = min(cfg.max_update_features, F)
    # strongest = just "selected", ranked by mask (1/0) with stable order
    sel_score = use_mask.astype(fj.H.dtype)
    _, top_idx = jax.lax.top_k(sel_score, K)
    top_use = use_mask[top_idx]
    Hm = jnp.where(top_use[:, None, None], fj.H[top_idx], 0.0).reshape(K * M, D)
    rm = jnp.where(top_use[:, None], fj.r[top_idx], 0.0).reshape(K * M)
    return apply_ekf_update(cfg, state, Hm, rm)
