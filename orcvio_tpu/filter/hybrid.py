"""Hybrid EKF-SLAM feature states (3d inverse-depth blocks in the covariance).

TPU-native equivalent of the reference's hybrid MSCKF/EKF machinery:
``measurementJacobian_ekf_3didp`` (orcvio.cpp:1229), ``featureJacobian_ekf_new``
(:1481) / the new-state initialization inside ``measurementUpdate_hybrid``
(:1766 — the H1/H2 split, dx_new = H2^{-1}(r1 - H1 dx), P22/P21 blocks),
``rmLostFeaturesCov`` (:3776) and ``delRedundantFeatures``. Static-shape
realization: a fixed capacity of E = cfg.ekf_feature_cap 3-dof blocks after
the clone blocks; slots are masked, promotion writes covariance blocks in
place, removal zeroes them.

Both inverse-depth parametrizations are supported (cfg.feature_idp_dim):
3d blocks (alpha, beta, rho) and 1d blocks (rho only, with the anchor bearing
fixed — measurementJacobian_ekf_1didp, orcvio.cpp:1356; both share
p_ca = (alpha/rho, beta/rho, 1/rho), the 1d H is the rho column and the
anchor-frame observation is not used). Anchor changes on prune are handled by
``reanchor_features`` (covariance via the exact autodiff re-parametrization
Jacobian — the reference's hand-written updateFeatureCov_3didp,
orcvio.cpp:3457, is buggy: it reads the OLD pose for the "new" camera).
Remaining documented deviation: the feature-free rows of newly
promoted features are discarded instead of joining the update. Jacobians use
the left/larvio clone-error convention, matching the reference's hybrid path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..math import se3, so3
from .augment import cam_poses
from .state import LEG, FilterState


def ekf_base(cfg: FilterConfig) -> int:
    return LEG + 6 * cfg.sw_size


def idp_dim(cfg: FilterConfig) -> int:
    return cfg.feature_idp_dim


class EkfRows(NamedTuple):
    H: jnp.ndarray  # (F, 2, D)
    r: jnp.ndarray  # (F, 2)
    valid: jnp.ndarray  # (F,)


def feature_world_points(state: FilterState, cfg: FilterConfig = None):
    """World positions of in-state features from (idp, anchor clone)."""
    if cfg is not None and cfg.nuisance_cap:
        R_c2w, t_c_w = extended_cam_poses(cfg, state)
        hi = R_c2w.shape[0] - 1
    else:
        R_c2w, t_c_w = cam_poses(state)
        hi = state.clones.valid.shape[0] - 1
    a = jnp.clip(state.features.anchor_slot, 0, hi)
    idp = state.features.idp
    rho = jnp.where(jnp.abs(idp[:, 2]) > 1e-8, idp[:, 2], 1e-8)
    p_ca = jnp.stack([idp[:, 0] / rho, idp[:, 1] / rho, 1.0 / rho], axis=1)
    p_w = jnp.einsum("fij,fj->fi", R_c2w[a], p_ca) + t_c_w[a]
    return p_w, p_ca


def ekf_feature_rows(cfg: FilterConfig, state: FilterState, cur_slot) -> EkfRows:
    """Per-frame 2-row blocks for tracked in-state features.

    Ref: measurementJacobian_ekf_3didp (orcvio.cpp:1229): residual of the
    current observation wrt [current clone, anchor clone, extrinsic, idp].
    """
    ft = state.features
    F = ft.fid.shape[0]
    D = state.P.shape[0]
    dtype = state.P.dtype
    sw = cfg.sw_size

    N = cfg.nuisance_cap
    anchor_valid_ext = jnp.concatenate([state.clones.valid, state.nui.valid]) if N else state.clones.valid
    hi = sw + N - 1 if N else sw - 1
    a = jnp.clip(ft.anchor_slot, 0, hi)
    valid = ft.in_state & ft.active & ft.uv_valid[:, cur_slot] & anchor_valid_ext[a]
    z = ft.uv[:, cur_slot]  # (F, 2)

    R_c2w, t_c_w = extended_cam_poses(cfg, state) if N else cam_poses(state)
    p_w, p_ca = feature_world_points(state, cfg)

    imu_p_ext = jnp.concatenate([state.clones.p, state.nui.p]) if N else state.clones.p
    R_w2ck = R_c2w[cur_slot].T  # (3, 3)
    t_ck_w = t_c_w[cur_slot]
    R_w2ca = jnp.swapaxes(R_c2w[a], -1, -2)  # (F, 3, 3)
    t_bk_w = state.clones.p[cur_slot]
    t_ba_w = imu_p_ext[a]  # (F, 3)

    p_ck = jnp.einsum("ij,fj->fi", R_w2ck, p_w - t_ck_w)  # (F, 3)
    zk = jnp.where(jnp.abs(p_ck[:, 2]) > 1e-6, p_ck[:, 2], 1e-6)
    zhat = p_ck[:, :2] / zk[:, None]
    r = z - zhat

    J_k = se3.project_image_df(p_ck.at[:, 2].set(zk))  # (F, 2, 3)
    # idp block: J_k (R_w2ck R_ca2w... R_w2ck R_w2ca^T) J_f
    J_p = jnp.einsum("ij,fjk->fik", R_w2ck, R_c2w[a])  # R_w2ck R_ca2w... (F,3,3)
    rho = jnp.where(jnp.abs(ft.idp[:, 2]) > 1e-8, ft.idp[:, 2], 1e-8)
    J_f = jnp.zeros((F, 3, 3), dtype)
    J_f = J_f.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    J_f = J_f.at[:, 0, 2].set(-ft.idp[:, 0] / rho)
    J_f = J_f.at[:, 1, 2].set(-ft.idp[:, 1] / rho)
    J_f = J_f.at[:, 2, 2].set(-1.0 / rho)
    J_f = J_f / rho[:, None, None]
    H_f3 = J_k @ J_p @ J_f  # (F, 2, 3)
    B = idp_dim(cfg)
    H_f = H_f3 if B == 3 else H_f3[..., 2:3]  # 1d: rho column (orcvio.cpp:1474)

    # clone blocks (left/larvio convention, orcvio.cpp:1327-1336)
    p_baf = p_w - t_ba_w
    p_bkf = p_w - t_bk_w[None]
    J_xa = jnp.concatenate(
        [-jnp.einsum("ij,fjk->fik", R_w2ck, so3.hat(p_baf)),
         jnp.broadcast_to(R_w2ck, (F, 3, 3))], axis=2
    )  # (F, 3, 6)
    J_xk = jnp.concatenate(
        [jnp.einsum("ij,fjk->fik", R_w2ck, so3.hat(p_bkf)),
         jnp.broadcast_to(-R_w2ck, (F, 3, 3))], axis=2
    )
    H_a = J_k @ J_xa  # (F, 2, 6)
    H_x = J_k @ J_xk

    # anchor-frame observation: 3d observes (alpha, beta) directly
    # (orcvio.cpp:1305); 1d does not use the anchor observation (:1434)
    at_anchor = a == cur_slot
    if B == 3:
        H_f_anchor = jnp.zeros((F, 2, 3), dtype).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
        r_anchor = z - ft.idp[:, :2]
        H_f = jnp.where(at_anchor[:, None, None], H_f_anchor, H_f)
        H_a = jnp.where(at_anchor[:, None, None], 0.0, H_a)
        H_x = jnp.where(at_anchor[:, None, None], 0.0, H_x)
        r = jnp.where(at_anchor[:, None], r_anchor, r)
    else:
        valid = valid & ~at_anchor

    # scatter into full-width rows
    H = jnp.zeros((F, 2, D), dtype)
    cols_k = LEG + 6 * cur_slot + jnp.arange(6)
    H = H.at[:, :, cols_k].add(H_x)
    # anchor columns: clone block, or nuisance block for demoted anchors
    a_col0 = jnp.where(a < sw, LEG + 6 * a, nui_base(cfg) + 6 * (a - sw))
    cols_a = a_col0[:, None, None] + jnp.arange(6)[None, None, :]
    f_i = jnp.arange(F)[:, None, None]
    r_i = jnp.arange(2)[None, :, None]
    H = H.at[f_i, r_i, cols_a].add(H_a)
    slot = jnp.clip(ft.state_slot, 0, max(cfg.ekf_feature_cap - 1, 0))
    cols_f = (ekf_base(cfg) + B * slot)[:, None, None] + jnp.arange(B)[None, None, :]
    H = H.at[f_i, r_i, cols_f].add(H_f)

    H = jnp.where(valid[:, None, None], H, 0.0)
    r = jnp.where(valid[:, None], r, 0.0)
    return EkfRows(H=H, r=r, valid=valid)


def split_projection(H_f, H, r):
    """Complete QR of H_f: split rows into feature-bearing and feature-free.

    Ref: featureJacobian_ekf_new (orcvio.cpp:1481). H_f (m, 3), H (m, D),
    r (m,). Returns (H1 (3, D), H2 (3, 3) upper-tri, r1 (3,), Ho (m, D),
    ro (m,)) with Ho/ro = the nullspace-projected part zero-padded.
    """
    m, k = H_f.shape
    Q, R = jnp.linalg.qr(H_f, mode="complete")
    Ht = Q.T @ H
    rt = Q.T @ r
    H1 = Ht[:k]
    H2 = R[:k]
    r1 = rt[:k]
    Ho = jnp.zeros_like(H).at[: m - k].set(Ht[k:])
    ro = jnp.zeros_like(r).at[: m - k].set(rt[k:])
    return H1, H2, r1, Ho, ro


def promote_features(cfg: FilterConfig, state: FilterState, cand_mask, H_raw, Hf_idp_raw, r_raw, dx,
                     row_ids=None):
    """Initialize up to P_MAX new EKF feature blocks after the frame's update.

    Ref: measurementUpdate_hybrid new-state block (orcvio.cpp:1824-1920):
    dx_new = H2^{-1}(r1 - H1 dx); P22 = HH P HH^T + sigma^2 (H2^T H2)^{-1};
    P21 = -HH P, with HH = H2^{-1} H1 and P the POST-update covariance.

    cand_mask selects rows of H_raw (F or gathered Kc leading dim);
    H_raw (·, M, D) unprojected Jacobians; Hf_idp_raw (·, M, 3) wrt idp;
    r_raw (·, M). row_ids maps H_raw rows to feature-table rows (identity
    when H_raw covers the whole table).
    """
    E = cfg.ekf_feature_cap
    if E == 0:
        return state
    B = idp_dim(cfg)
    P_MAX = min(4, E)
    D = state.P.shape[0]
    dtype = state.P.dtype
    sigma2 = cfg.observation_noise**2
    base = ekf_base(cfg)
    if row_ids is None:
        row_ids = jnp.arange(H_raw.shape[0], dtype=jnp.int32)

    # rank candidates: selected first
    score = cand_mask.astype(dtype)
    _, cand_idx = jax.lax.top_k(score, P_MAX)
    cand_ok = cand_mask[cand_idx]

    def body(i, st):
        g = cand_idx[i]  # index into the gathered arrays
        f = row_ids[g]  # feature-table row
        ok = cand_ok[i]
        # free slot: lowest slot not used by any in-state feature
        used = jnp.zeros((E,), bool).at[
            jnp.where(st.features.in_state, jnp.clip(st.features.state_slot, 0, E - 1), E)
        ].set(True, mode="drop")
        slot = jnp.argmin(used)
        have_slot = ~used[slot]
        do = ok & have_slot

        H1, H2, r1, _, _ = split_projection(Hf_idp_raw[g], H_raw[g], r_raw[g])
        H2r = H2 + 1e-10 * jnp.eye(B, dtype=dtype)
        HH = jax.scipy.linalg.solve_triangular(H2r, H1, lower=False)  # (B, D)
        dx_new = jax.scipy.linalg.solve_triangular(H2r, r1 - H1 @ dx, lower=False)
        H2i = jax.scipy.linalg.solve_triangular(H2r, jnp.eye(B, dtype=dtype), lower=False)
        P21 = -HH @ st.P  # (B, D)
        P22 = -P21 @ HH.T + sigma2 * (H2i @ H2i.T)

        c0 = base + B * slot
        P = st.P
        P = jax.lax.dynamic_update_slice(P, jnp.zeros((B, D), dtype), (c0, 0))
        P = jax.lax.dynamic_update_slice(P, jnp.zeros((D, B), dtype), (0, c0))
        P = jax.lax.dynamic_update_slice(P, P21, (c0, 0))
        P = jax.lax.dynamic_update_slice(P, P21.T, (0, c0))
        P = jax.lax.dynamic_update_slice(P, P22, (c0, c0))
        P = 0.5 * (P + P.T)

        ft = st.features
        didp = jnp.zeros(3, dtype).at[3 - B :].set(dx_new) if B == 1 else dx_new
        ft2 = ft.replace(
            in_state=ft.in_state.at[f].set(True),
            state_slot=ft.state_slot.at[f].set(slot.astype(jnp.int32)),
            idp=ft.idp.at[f].add(didp),
        )
        st2 = st.replace(P=P, features=ft2)
        return jax.tree.map(lambda a_, b_: jnp.where(do, a_, b_), st2, st)

    return jax.lax.fori_loop(0, P_MAX, body, state)


def remove_state_features(cfg: FilterConfig, state: FilterState, kill_mask):
    """Drop in-state features: zero their covariance blocks, free slots.

    Ref: rmLostFeaturesCov (orcvio.cpp:3776) — with static slots this is pure
    masking, no block shifting.
    """
    E = cfg.ekf_feature_cap
    if E == 0:
        return state
    B = idp_dim(cfg)
    D = state.P.shape[0]
    base = ekf_base(cfg)
    kill = kill_mask & state.features.in_state
    slot_killed = jnp.zeros((E,), bool).at[
        jnp.where(kill, jnp.clip(state.features.state_slot, 0, E - 1), E)
    ].set(True, mode="drop")
    colmask = jnp.ones((D,), bool)
    colmask = colmask.at[base : base + B * E].set(~jnp.repeat(slot_killed, B))
    P = state.P * (colmask[:, None] & colmask[None, :])
    ft = state.features
    ft = ft.replace(
        in_state=ft.in_state & ~kill,
        state_slot=jnp.where(kill, -1, ft.state_slot),
    )
    return state.replace(P=P, features=ft)


# ---------------------------------------------------------------------------
# Schmidt nuisance states (use_schmidt, orcvio.h:167-170)
# ---------------------------------------------------------------------------

def nui_base(cfg: FilterConfig) -> int:
    # nuisance blocks sit after the EKF features AND the IMU-intrinsic block
    return ekf_base(cfg) + idp_dim(cfg) * cfg.ekf_feature_cap + cfg.intrinsic_dim


def extended_cam_poses(cfg: FilterConfig, state: FilterState):
    """Camera poses for clones ++ nuisance clones, indexable by extended
    anchor slots (anchor >= sw_size refers to nuisance slot anchor - sw)."""
    R_c2w, t_c_w = cam_poses(state)
    if cfg.nuisance_cap == 0:
        return R_c2w, t_c_w
    R_n = state.nui.R @ state.R_b2c.T
    t_n = state.nui.p + jnp.einsum("nij,j->ni", state.nui.R, state.t_c_b)
    return jnp.concatenate([R_c2w, R_n]), jnp.concatenate([t_c_w, t_n])


def schmidt_demote(cfg: FilterConfig, state: FilterState, prune_mask):
    """Move pruned clones with anchored EKF features into nuisance slots.

    Ref: the Schmidt branch of pruneImuStateBuffer (orcvio.cpp:2874-2955
    moves blocks to the nuisance section instead of deleting). Covariance
    rows/cols are copied from the clone block to the nuisance block; feature
    anchor_slot is remapped to sw_size + nui_slot. Falls back to removal when
    no nuisance slot is free (handled by the caller's removal pass, which
    runs after this on any still-pruned anchors).
    """
    N = cfg.nuisance_cap
    if N == 0 or not cfg.use_schmidt:
        return state
    sw = cfg.sw_size
    D = state.P.shape[0]
    nb = nui_base(cfg)

    def body(slot, st):
        ft = st.features
        has_anchor = jnp.any(ft.in_state & (ft.anchor_slot == slot))
        do = prune_mask[slot] & has_anchor & st.clones.valid[slot]
        free = ~st.nui.valid
        n_slot = jnp.argmax(free)
        do = do & free[n_slot]

        c0 = LEG + 6 * slot
        n0 = nb + 6 * n_slot
        P = st.P
        rows = jax.lax.dynamic_slice(P, (c0, 0), (6, D))
        P = jax.lax.dynamic_update_slice(P, rows, (n0, 0))
        cols = jax.lax.dynamic_slice(P, (0, c0), (D, 6))
        P = jax.lax.dynamic_update_slice(P, cols, (0, n0))
        blk = jax.lax.dynamic_slice(st.P, (c0, c0), (6, 6))
        P = jax.lax.dynamic_update_slice(P, blk, (n0, n0))
        # zero stale cross between the new nuisance block and the old clone cols
        P = jax.lax.dynamic_update_slice(P, jnp.zeros((6, 6), P.dtype), (n0, c0))
        P = jax.lax.dynamic_update_slice(P, jnp.zeros((6, 6), P.dtype), (c0, n0))

        nui = st.nui.replace(
            R=st.nui.R.at[n_slot].set(st.clones.R[slot]),
            p=st.nui.p.at[n_slot].set(st.clones.p[slot]),
            t=st.nui.t.at[n_slot].set(st.clones.t[slot]),
            valid=st.nui.valid.at[n_slot].set(True),
        )
        remap = ft.in_state & (ft.anchor_slot == slot)
        ft2 = ft.replace(
            anchor_slot=jnp.where(remap, sw + n_slot, ft.anchor_slot).astype(jnp.int32)
        )
        st2 = st.replace(P=P, nui=nui, features=ft2)
        return jax.tree.map(lambda a_, b_: jnp.where(do, a_, b_), st2, st)

    return jax.lax.fori_loop(0, sw, body, state)


def retire_nuisance(cfg: FilterConfig, state: FilterState):
    """Free nuisance slots with no anchored features (rmUselessNuisanceState,
    orcvio.cpp:4421): zero their covariance blocks + invalidate."""
    N = cfg.nuisance_cap
    if N == 0:
        return state
    sw = cfg.sw_size
    ft = state.features
    anchored = jnp.zeros((N,), bool).at[
        jnp.where(ft.in_state & (ft.anchor_slot >= sw), jnp.clip(ft.anchor_slot - sw, 0, N - 1), N)
    ].set(True, mode="drop")
    kill = state.nui.valid & ~anchored
    D = state.P.shape[0]
    nb = nui_base(cfg)
    colmask = jnp.ones((D,), bool)
    colmask = colmask.at[nb : nb + 6 * N].set(~jnp.repeat(kill, 6))
    P = state.P * (colmask[:, None] & colmask[None, :])
    return state.replace(P=P, nui=state.nui.replace(valid=state.nui.valid & ~kill))


def reanchor_features(cfg: FilterConfig, state: FilterState, prune_mask, cur_slot):
    """Re-anchor in-state features whose anchor clone is being pruned.

    Ref: the anchor-change branch of pruneImuStateBuffer (orcvio.cpp:2666-2725)
    + updateFeatureCov_3didp/_1didp (:3457/:3611). The new anchor is the
    current (newest) clone; the feature mean is re-parametrized
    (idp_new from p_w and the new anchor camera) and the covariance block is
    transformed by the Jacobian of that re-parametrization wrt
    [idp_old, old-anchor clone error, new-anchor clone error, extrinsic].
    The Jacobian is taken by forward-mode autodiff of the exact transform at
    zero perturbation (the reference's hand-written version looks up the OLD
    pose for the "new" camera — orcvio.cpp:3487 — collapsing the clone terms;
    we compute the correct one). Features whose re-anchoring is degenerate
    (non-positive/near-zero new depth) are left untouched so the caller's
    removal pass drops them.
    """
    E = cfg.ekf_feature_cap
    if E == 0:
        return state
    B = idp_dim(cfg)
    sw = cfg.sw_size
    D = state.P.shape[0]
    dtype = state.P.dtype
    ft = state.features
    F = ft.fid.shape[0]
    base = ekf_base(cfg)

    in_window = (ft.anchor_slot >= 0) & (ft.anchor_slot < sw)
    a = jnp.clip(ft.anchor_slot, 0, sw - 1)
    need = ft.in_state & in_window & prune_mask[a] & (a != cur_slot)
    if_any = jnp.any(need)

    R_b2c = state.R_b2c
    t_c_b = state.t_c_b
    Ra = state.clones.R[a]  # (F, 3, 3)
    pa = state.clones.p[a]  # (F, 3)
    Rk = state.clones.R[cur_slot]
    pk = state.clones.p[cur_slot]

    def g(delta, idp, Ra_f, pa_f):
        # perturbation conventions match ekf_feature_rows / measurement_jacobians:
        # clone: R <- exp(dth) R, p <- p + dp; extrinsic: R_b2c <- R_b2c exp(-dth_e)
        dth_a, dp_a = delta[3:6], delta[6:9]
        dth_k, dp_k = delta[9:12], delta[12:15]
        dth_e, dt_e = delta[15:18], delta[18:21]
        idp_p = idp + delta[:3]
        Rbc = R_b2c @ so3.exp(-dth_e)
        tcb = t_c_b + dt_e
        Ra_p = so3.exp(dth_a) @ Ra_f
        Rk_p = so3.exp(dth_k) @ Rk
        rho = jnp.where(jnp.abs(idp_p[2]) > 1e-8, idp_p[2], 1e-8)
        p_ca = jnp.stack([idp_p[0] / rho, idp_p[1] / rho, 1.0 / rho])
        p_w = Ra_p @ (Rbc.T @ p_ca + tcb) + pa_f + dp_a
        p_ck = Rbc @ (Rk_p.T @ (p_w - pk - dp_k) - tcb)
        z = jnp.where(jnp.abs(p_ck[2]) > 1e-6, p_ck[2], 1e-6)
        return jnp.stack([p_ck[0] / z, p_ck[1] / z, 1.0 / z]), p_ck[2]

    def per_feature(idp, Ra_f, pa_f):
        zero = jnp.zeros(21, dtype)
        (idp_new, depth), _ = jax.jvp(lambda d: g(d, idp, Ra_f, pa_f), (zero,), (zero,))
        J = jax.jacfwd(lambda d: g(d, idp, Ra_f, pa_f)[0])(zero)  # (3, 21)
        return idp_new, depth, J

    idp_new, depth, J = jax.vmap(per_feature)(ft.idp, Ra, pa)
    ok = need & (depth > 1e-3) & jnp.all(jnp.isfinite(idp_new), axis=1) \
        & jnp.all(jnp.isfinite(J.reshape(F, -1)), axis=1)

    if B == 1:
        J = J[:, 2:3, :]  # rho row only
        J_idp = J[:, :, 2:3]  # d rho_new / d rho_old
    else:
        J_idp = J[:, :, :3]

    # build the replacement rows R_f (F, B, D) of the global transform
    slot = jnp.clip(ft.state_slot, 0, E - 1)
    row0 = base + B * slot  # (F,)
    f_i = jnp.arange(F)[:, None, None]
    r_i = jnp.arange(B)[None, :, None]
    rows = jnp.zeros((F, B, D), dtype)
    cols_own = row0[:, None, None] + jnp.arange(B)[None, None, :]
    rows = rows.at[f_i, r_i, cols_own].add(J_idp)
    cols_a = (LEG + 6 * a)[:, None, None] + jnp.arange(6)[None, None, :]
    rows = rows.at[f_i, r_i, cols_a].add(J[:, :, 3:9])
    cols_k = LEG + 6 * cur_slot + jnp.arange(6)
    rows = rows.at[:, :, cols_k].add(J[:, :, 9:15])
    rows = rows.at[:, :, 15:21].add(J[:, :, 15:21])
    # identity fallback rows for in-state features not re-anchoring
    ident = jnp.zeros((F, B, D), dtype).at[f_i, r_i, cols_own].set(1.0)
    rows = jnp.where(ok[:, None, None], rows, ident)

    # apply P' rows/cols for the feature blocks: A = R P; block = A R^T
    flat_rows = rows.reshape(F * B, D)
    A = flat_rows @ state.P  # (FB, D)
    blk = A @ flat_rows.T  # (FB, FB)
    idx = jnp.where(ft.in_state[:, None],
                    row0[:, None] + jnp.arange(B)[None, :], D).reshape(-1)
    P = state.P.at[idx, :].set(A, mode="drop")
    P = P.at[:, idx].set(A.T, mode="drop")
    P = P.at[idx[:, None], idx[None, :]].set(blk, mode="drop")
    P = 0.5 * (P + P.T)

    new_idp = jnp.where(ok[:, None], idp_new, ft.idp)
    ft2 = ft.replace(
        idp=new_idp,
        anchor_slot=jnp.where(ok, cur_slot, ft.anchor_slot).astype(jnp.int32),
    )
    st2 = state.replace(P=P, features=ft2)
    return jax.tree.map(lambda x, y: jnp.where(if_any, x, y), st2, state)
