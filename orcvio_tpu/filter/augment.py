"""Clone augmentation and sliding-window pruning on the ring buffer.

TPU-native equivalent of ``stateAugmentation`` (orcvio.cpp:930) and
``pruneImuStateBuffer``/``findRedundantImuStates`` (orcvio.cpp:2629/2582).
The reference resizes/shifts the covariance; here clone slots are fixed and
"insert"/"remove" are pure block writes + mask updates — no data movement of
unrelated blocks, which is both cheaper and XLA-friendly.

Deviations (documented):
 * findRedundantImuStates: we use the clean OpenVINS/MSCKF-VIO two-candidate
   rule (compare 3rd- and 2nd-from-latest clones against the 4th-from-latest
   "key"; prune the candidate if its relative motion is small, else the oldest
   clone). The reference's iterator arithmetic (orcvio.cpp:2600-2620) walks
   backwards two extra steps in the else branch — an artifact, not a design.
 * The "last-chance" mini-update on observations dying with pruned clones
   (orcvio.cpp:2803-2851) is folded into the main per-frame update upstream;
   see pipeline.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..math import so3
from .state import LEG, FilterState


def _slot_cols(slot):
    """Dynamic 6-column index range for a clone slot."""
    return LEG + 6 * slot


def state_augmentation(cfg: FilterConfig, state: FilterState) -> FilterState:
    """Insert the current IMU pose as a clone. Ref: stateAugmentation (orcvio.cpp:930).

    Covariance: rows/cols of the chosen slot are overwritten with
    J P | J P J^T where J picks the [theta, p] blocks of the leg
    (orcvio.cpp:966-969). Assumes at least one free slot (pruning guarantees
    this); picks the first invalid slot.
    """
    slot = jnp.argmin(state.clones.valid.astype(jnp.int32))  # first free slot
    D = state.P.shape[0]
    dtype = state.P.dtype

    # J: (6, D) — clone error = [theta_imu, p_imu]
    J = jnp.zeros((6, D), dtype)
    J = J.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    J = J.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype))

    # Zero the stale slot rows/cols first so JP picks up zero cross-cov there.
    col0 = _slot_cols(slot)
    P = state.P
    P = jax.lax.dynamic_update_slice(P, jnp.zeros((6, D), dtype), (col0, 0))
    P = jax.lax.dynamic_update_slice(P, jnp.zeros((D, 6), dtype), (0, col0))

    JP = J @ P  # (6, D)
    P = jax.lax.dynamic_update_slice(P, JP, (col0, 0))
    P = jax.lax.dynamic_update_slice(P, JP.T, (0, col0))
    P = jax.lax.dynamic_update_slice(P, JP @ J.T, (col0, col0))
    P = 0.5 * (P + P.T)

    clones = state.clones.replace(
        R=state.clones.R.at[slot].set(state.imu.R),
        p=state.clones.p.at[slot].set(state.imu.p),
        p_fej=state.clones.p_fej.at[slot].set(state.imu_fej_now.p),
        t=state.clones.t.at[slot].set(state.t),
        order=state.clones.order.at[slot].set(state.next_order),
        valid=state.clones.valid.at[slot].set(True),
    )
    return state.replace(clones=clones, P=P, next_order=state.next_order + 1)


def current_clone_slot(state: FilterState):
    """Slot of the most recently inserted clone."""
    order = jnp.where(state.clones.valid, state.clones.order, -1)
    return jnp.argmax(order)


def cam_poses(state: FilterState):
    """Camera pose (R_c2w, t_c_w) per clone slot from clones + extrinsics.

    Ref: stateAugmentation camera-pose bookkeeping (orcvio.cpp:954-961); we
    derive on demand instead of storing.
    """
    R_c2w = state.clones.R @ state.R_b2c.T  # (SW, 3, 3)
    t_c_w = state.clones.p + jnp.einsum("sij,j->si", state.clones.R, state.t_c_b)
    return R_c2w, t_c_w


def select_prune_slots(cfg: FilterConfig, state: FilterState, tracking_rate,
                       rotation_threshold=0.2618, translation_threshold=0.4,
                       tracking_rate_threshold=0.5):
    """Choose up to 2 clone slots to prune. Ref: findRedundantImuStates (orcvio.cpp:2582).

    Returns (prune_mask (SW,), do_prune scalar bool). Pruning happens only when
    the window is full (all slots valid), keeping >= 2 slots free afterwards.
    """
    sw = cfg.sw_size
    full = jnp.all(state.clones.valid)
    order = jnp.where(state.clones.valid, state.clones.order, jnp.iinfo(jnp.int32).min)
    rank = jnp.argsort(order)  # ascending: rank[0] = oldest slot, rank[-1] = newest

    R_c2w, t_c_w = cam_poses(state)
    key_slot = rank[sw - 4]
    key_R = R_c2w[key_slot]
    key_p = t_c_w[key_slot]

    def redundant(slot):
        dist = jnp.linalg.norm(t_c_w[slot] - key_p)
        ang = jnp.linalg.norm(so3.log(R_c2w[slot].T @ key_R))
        return (ang < rotation_threshold) & (dist < translation_threshold) & (
            tracking_rate > tracking_rate_threshold
        )

    cand1, cand2 = rank[sw - 3], rank[sw - 2]
    old1, old2 = rank[0], rank[1]
    r1 = redundant(cand1)
    r2 = redundant(cand2)
    slot_a = jnp.where(r1, cand1, old1)
    # second pick: candidate 2 if redundant, else next oldest not yet taken
    slot_b = jnp.where(r2, cand2, jnp.where(r1, old1, old2))
    mask = jnp.zeros((sw,), bool).at[slot_a].set(True).at[slot_b].set(True)
    return mask & full, full


def prune_clones(state: FilterState, prune_mask) -> FilterState:
    """Remove clones by mask: zero their P rows/cols, invalidate slots, drop obs.

    Ref: pruneImuStateBuffer block deletion (orcvio.cpp:2874-2955) — with a
    ring buffer this is pure masking; no shifting.
    """
    D = state.P.shape[0]
    sw = prune_mask.shape[0]
    # column mask over the full error state
    colmask = jnp.ones((D,), bool)
    clone_cols = jnp.repeat(prune_mask, 6)
    colmask = colmask.at[LEG : LEG + 6 * sw].set(~clone_cols)
    P = state.P * (colmask[:, None] & colmask[None, :])
    clones = state.clones.replace(
        valid=state.clones.valid & ~prune_mask,
        order=jnp.where(prune_mask, -1, state.clones.order),
    )
    features = state.features.replace(
        uv_valid=state.features.uv_valid & ~prune_mask[None, :]
    )
    return state.replace(P=P, clones=clones, features=features)


def increment_state(cfg: FilterConfig, state: FilterState, dx) -> FilterState:
    """Apply an error-state correction. Ref: incrementState_IMUCam (orcvio.cpp:4468).

    Left perturbation (or larvio): R <- exp(dtheta) R; right: R <- R exp(dtheta).
    The discard-large-update guard (orcvio.cpp:4479-4494) zeroes the mean
    increment when |dv| > 1 or |dp| > 1.5 but — exactly like the reference —
    does not stop the caller's covariance update.
    """
    left = cfg.use_larvio or cfg.use_left_perturbation
    big = (jnp.linalg.norm(dx[3:6]) > 1.0) | (jnp.linalg.norm(dx[6:9]) > 1.5)
    dx = jnp.where(big, jnp.zeros_like(dx), dx)

    dR = so3.exp(dx[0:3])
    imu = state.imu.replace(
        R=dR @ state.imu.R if left else state.imu.R @ dR,
        v=state.imu.v + dx[3:6],
        p=state.imu.p + dx[6:9],
        bg=state.imu.bg + dx[9:12],
        ba=state.imu.ba + dx[12:15],
    )
    # extrinsic: R_imu_cam0 <- R_imu_cam0 exp(dtheta_e)^T (orcvio.cpp:4516-4519)
    R_b2c = state.R_b2c @ so3.exp(dx[15:18]).T
    t_c_b = state.t_c_b + dx[18:21]
    td = state.td + dx[21]

    sw = state.clones.valid.shape[0]
    dclone = dx[LEG : LEG + 6 * sw].reshape(sw, 6)
    dRc = so3.exp(dclone[:, 0:3])
    Rc = dRc @ state.clones.R if left else state.clones.R @ dRc
    pc = state.clones.p + dclone[:, 3:6]
    # only valid slots move (invalid slots have zero cov so dx should be 0
    # anyway, but keep it explicit)
    Rc = jnp.where(state.clones.valid[:, None, None], Rc, state.clones.R)
    pc = jnp.where(state.clones.valid[:, None], pc, state.clones.p)
    clones = state.clones.replace(R=Rc, p=pc)
    state = state.replace(imu=imu, R_b2c=R_b2c, t_c_b=t_c_b, td=td, clones=clones)

    # EKF-SLAM feature blocks: idp += dx (measurementUpdate_hybrid invParam
    # update, orcvio.cpp:1862-1874)
    E = cfg.ekf_feature_cap
    if E:
        B = cfg.feature_idp_dim
        base = LEG + 6 * sw
        dfeat = dx[base : base + B * E].reshape(E, B)
        if B == 1:  # rho-only blocks update idp[:, 2]
            dfeat = jnp.concatenate([jnp.zeros((E, 2), dfeat.dtype), dfeat], axis=1)
        ft = state.features
        slot = jnp.clip(ft.state_slot, 0, E - 1)
        delta = jnp.where(ft.in_state[:, None], dfeat[slot], 0.0)
        state = state.replace(features=ft.replace(idp=ft.idp + delta))

    # IMU intrinsics (orcvio.cpp:4523-4533: additive T*/A*/M* then updateImuMx)
    if cfg.calib_imu:
        from .state import apply_imu_intrinsics_delta

        ib = cfg.intrinsic_base
        Tg, As, Ma = apply_imu_intrinsics_delta(
            state.Tg, state.As, state.Ma, dx[ib : ib + 24]
        )
        state = state.replace(Tg=Tg, As=As, Ma=Ma)
    return state
