"""The per-frame filter step: propagate -> augment -> ingest -> update -> prune.

TPU-native equivalent of ``OrcVIO::processFeatures`` (orcvio.cpp:500) minus
initialization (init/ subpackage) and objects (objects/ subpackage): a pure
jittable function FilterState x FrameInput -> FilterState x FrameOutput,
designed to be driven by ``lax.scan`` over a trajectory and ``vmap``/shard_map
over many trajectories.

Deviations from the reference's control flow (documented):
 * The reference runs the lost-feature update then the pruning "last-chance"
   update as two separate EKF updates per frame; we do the same when
   ``prune_last_chance`` is on (the default, matching orcvio.cpp:2803-2851),
   each update stacked and QR-compressed on its own.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..math import linalg
from . import features as feat
from . import propagation as prop
from .augment import (
    cam_poses,
    current_clone_slot,
    prune_clones,
    select_prune_slots,
    state_augmentation,
)
from .state import FilterState
from .tracks import compact_tracks
from .triangulation import check_motion, triangulate
from .update import feature_jacobians, gate_features, msckf_update


class FrameInput(NamedTuple):
    """One camera frame + its IMU slab (pre-binned at dataset load)."""

    t: jnp.ndarray  # scalar image timestamp
    imu_t: jnp.ndarray  # (S,)
    imu_gyro: jnp.ndarray  # (S, 3)
    imu_acc: jnp.ndarray  # (S, 3)
    imu_mask: jnp.ndarray  # (S,)
    fids: jnp.ndarray  # (M,) int32 feature track ids
    uvs: jnp.ndarray  # (M, 2) normalized coords
    uv_vels: jnp.ndarray  # (M, 2)
    meas_mask: jnp.ndarray  # (M,)


class FrameOutput(NamedTuple):
    t: jnp.ndarray
    R: jnp.ndarray  # (3, 3) body->world
    p: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    n_update_features: jnp.ndarray
    dx_norm: jnp.ndarray
    zupt: jnp.ndarray = False  # ZUPT fired this frame


def build_chi2_table(cfg: FilterConfig, dtype=jnp.float32):
    return linalg.chi_squared_table(cfg.chi2_confidence).astype(dtype)


def filter_step(cfg: FilterConfig, state: FilterState, frame: FrameInput, chi2_table):
    """One frame. Ref call stack: orcvio.cpp:500-660 (processFeatures).

    Traced under HIGHEST matmul precision: the covariance algebra is
    catastrophically sensitive to the TPU's default bf16 MXU passes in f32
    (P goes indefinite within ~100 frames and the filter diverges, rmse
    5 m -> 0.2 m with true-f32 matmuls at ~4% throughput cost)."""
    with jax.default_matmul_precision("highest"):
        return _filter_step(cfg, state, frame, chi2_table)


def _filter_step(cfg: FilterConfig, state: FilterState, frame: FrameInput, chi2_table):
    # 1. IMU propagation to the frame time (batchImuProcessing, :567)
    state = prop.imu_batch(cfg, state, frame.imu_t, frame.imu_gyro, frame.imu_acc, frame.imu_mask)

    # 2. clone augmentation (:930)
    state = state_augmentation(cfg, state)
    cur_slot = current_clone_slot(state)

    # 3. ingest feature measurements (addFeatureObservations, :1016);
    #    prediction_only skips ingestion so no update can ever fire
    #    (prediction_only_flag, orcvio.cpp:569)
    prev_live = jnp.sum(state.features.active)
    if cfg.prediction_only:
        tracking_rate = jnp.ones((), state.P.dtype)
    else:
        table, tracked = feat.add_observations(
            state.features, cur_slot, frame.fids, frame.uvs, frame.uv_vels, frame.meas_mask
        )
        state = state.replace(features=table)
        tracking_rate = tracked / jnp.maximum(prev_live, 1)

    # 3b. zero-velocity update (orcvio.cpp:580-590: checkZUPTFeat ->
    #     checkZUPTIMU fallback -> measurementUpdate_ZUPT_vpq)
    do_zupt = jnp.zeros((), bool)
    if cfg.if_zupt:
        from .zupt import check_zupt_feat, check_zupt_imu, zupt_update

        do_feat = check_zupt_feat(cfg, state)
        do_imu = check_zupt_imu(
            cfg, state, frame.imu_t, frame.imu_gyro, frame.imu_acc, frame.imu_mask, chi2_table
        )
        do_zupt = do_feat | do_imu
        zupted = zupt_update(cfg, state)
        state = jax.tree.map(lambda a, b: jnp.where(do_zupt, a, b), zupted, state)

    # 4. classification (removeLostFeatures, :2196)
    E = cfg.ekf_feature_cap
    if E:
        from .hybrid import remove_state_features

        # drop in-state features that lost track or whose anchor died
        # (rmLostFeaturesCov, orcvio.cpp:3776); anchor changes on PRUNE are
        # re-anchored later in step 8 (reanchor_features)
        ft = state.features
        sw = cfg.sw_size
        if cfg.nuisance_cap:
            valid_ext = jnp.concatenate([state.clones.valid, state.nui.valid])
            anchor_ok = (ft.anchor_slot >= 0) & valid_ext[
                jnp.clip(ft.anchor_slot, 0, sw + cfg.nuisance_cap - 1)
            ]
        else:
            anchor_ok = (ft.anchor_slot >= 0) & state.clones.valid[
                jnp.clip(ft.anchor_slot, 0, sw - 1)
            ]
        kill_state = ft.in_state & (~ft.active | ~anchor_ok)
        state = remove_state_features(cfg, state, kill_state)
        state = state.replace(features=feat.free_rows(state.features, kill_state))
        if cfg.use_schmidt and cfg.nuisance_cap:
            from .hybrid import retire_nuisance

            state = retire_nuisance(cfg, state)

    live = state.features.fid >= 0
    active = state.features.active
    in_state = state.features.in_state
    tl = feat.track_lengths(state.features)
    lost = live & ~active & ~in_state
    too_long = live & active & (tl >= cfg.max_track_len) & ~in_state
    finished = lost | too_long
    enough = tl >= cfg.min_track_len  # least_observation_number

    # 5. triangulation (feature.hpp:583); exclude the current clone obs
    #    (initializePosition skips curr_id, feature.hpp:416).
    # Only candidate (finishing) features can enter the update, so both the
    # triangulation LM and the (K, 2T, D) Jacobian tensor are built on a
    # gathered top-K subset — the full-table variants are pure zero-row
    # traffic.
    ct = compact_tracks(state.features, state.clones.order, cfg.max_track_len)
    tri_entry_mask = ct.mask & ~(active[:, None] & (ct.slot == cur_slot))
    ct_tri = ct._replace(mask=tri_entry_mask, n_obs=jnp.sum(tri_entry_mask, axis=1).astype(jnp.int32))
    R_c2w, t_c_w = cam_poses(state)
    motion_ok = check_motion(ct_tri, R_c2w, t_c_w, cfg.tri_translation_threshold)

    F = state.features.fid.shape[0]
    Kc = min(cfg.max_update_features, F)
    pre_cand = finished & enough & motion_ok
    _, cand_idx = jax.lax.top_k(pre_cand.astype(state.P.dtype), Kc)
    ct_tri_k = jax.tree.map(lambda a_: a_[cand_idx], ct_tri)
    tri = triangulate(cfg, ct_tri_k, R_c2w, t_c_w)  # gathered (Kc,) results

    # 6. Jacobians over the full track (featureJacobian_msckf uses all obs)
    ct_k = jax.tree.map(lambda a_: a_[cand_idx], ct)
    fj = feature_jacobians(cfg, state, ct_k, tri.p_world)
    gated = gate_features(cfg, state, fj, chi2_table)
    use_k = pre_cand[cand_idx] & tri.valid & fj.usable & gated  # (Kc,)
    lost_k = lost[cand_idx]
    too_long_k = too_long[cand_idx]

    if E:
        from .hybrid import ekf_feature_rows, promote_features

        # choose promotions: tracked-too-long, valid triangulation, free slots
        # (removeLostFeatures grid branch, orcvio.cpp:2287-2305; the spatial
        # grid is replaced by slot capacity)
        cand_k = use_k & too_long_k
        n_free = E - jnp.sum(in_state)
        rank = jnp.cumsum(cand_k) - 1
        promote_k = cand_k & (rank < jnp.minimum(4, n_free))

        # idp-parametrized feature Jacobian at the PRE-update linearization
        # (featureJacobian_ekf_new, orcvio.cpp:1481)
        inv_k = tri.inv_param  # already gathered (Kc,)
        a = jnp.clip(tri.anchor_slot, 0, cfg.sw_size - 1)
        rho = jnp.where(jnp.abs(inv_k[:, 2]) > 1e-8, inv_k[:, 2], 1e-8)
        J_f = jnp.zeros((Kc, 3, 3), state.P.dtype)
        J_f = J_f.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
        J_f = J_f.at[:, 0, 2].set(-inv_k[:, 0] / rho)
        J_f = J_f.at[:, 1, 2].set(-inv_k[:, 1] / rho)
        J_f = J_f.at[:, 2, 2].set(-1.0 / rho)
        J_f = J_f / rho[:, None, None]
        dpw_didp = R_c2w[a] @ J_f  # (Kc, 3, 3)
        Hf_idp = jnp.einsum("fmi,fij->fmj", fj.Hf_raw, dpw_didp)
        if cfg.feature_idp_dim == 1:
            Hf_idp = Hf_idp[..., 2:3]  # rho column only (1d idp)

        # stacked update: compacted msckf rows + tracked in-state feature
        # rows; promoted features contribute their FEATURE-FREE rows (the
        # bottom of the H_f QR split — measurementUpdate_hybrid,
        # orcvio.cpp:1766 stacks Ho of the to-be-initialized features)
        from .hybrid import split_projection

        D = state.P.shape[0]
        M = fj.H.shape[1]
        _, _, _, Ho_k, ro_k = jax.vmap(split_projection)(Hf_idp, fj.H_raw, fj.r_raw)
        Hm_rows = jnp.where(promote_k[:, None, None], Ho_k, fj.H)
        rm_rows = jnp.where(promote_k[:, None], ro_k, fj.r)
        Hm = jnp.where(use_k[:, None, None], Hm_rows, 0.0).reshape(Kc * M, D)
        rm = jnp.where(use_k[:, None], rm_rows, 0.0).reshape(Kc * M)
        er = ekf_feature_rows(cfg, state, cur_slot)
        _, etop = jax.lax.top_k(er.valid.astype(fj.H.dtype), min(E, er.valid.shape[0]))
        ev = er.valid[etop]
        He = jnp.where(ev[:, None, None], er.H[etop], 0.0).reshape(-1, D)
        re = jnp.where(ev[:, None], er.r[etop], 0.0).reshape(-1)
        from .update import apply_ekf_update

        state, dx = apply_ekf_update(
            cfg, state, jnp.concatenate([Hm, He]), jnp.concatenate([rm, re])
        )

        # initialize promoted feature blocks (post-update P and dx, as the
        # reference's measurementUpdate_hybrid does)
        use_upd = use_k & ~promote_k
        # scatter promotion decisions back to table rows
        promote_mask = jnp.zeros((F,), bool).at[
            jnp.where(promote_k, cand_idx, F)
        ].set(True, mode="drop")
        ftab = state.features.replace(
            idp=state.features.idp.at[jnp.where(promote_k, cand_idx, F)].set(inv_k, mode="drop"),
            anchor_slot=state.features.anchor_slot.at[
                jnp.where(promote_k, cand_idx, F)
            ].set(tri.anchor_slot.astype(jnp.int32), mode="drop"),
        )
        state = state.replace(features=ftab)
        state = promote_features(
            cfg, state, promote_k, fj.H_raw, Hf_idp, fj.r_raw, dx, row_ids=cand_idx
        )
        erase = finished & ~promote_mask
        use = jnp.zeros((F,), bool).at[jnp.where(use_upd, cand_idx, F)].set(True, mode="drop")
    else:
        state, dx = msckf_update(cfg, state, fj, use_k)
        use = jnp.zeros((F,), bool).at[jnp.where(use_k, cand_idx, F)].set(True, mode="drop")
        erase = finished

    # 7. cleanup: erase finished features (map_server.erase, :2570-2576)
    state = state.replace(features=feat.free_rows(state.features, erase))

    # 8. prune clones when the window is full (pruneImuStateBuffer, :2629)
    prune_mask, _ = select_prune_slots(cfg, state, tracking_rate)

    # 8a. "last-chance" MSCKF update on observations dying with the pruned
    #     clones (orcvio.cpp:2803-2851): active non-EKF features with >= 2
    #     observations on pruned slots contribute rows over JUST those
    #     observations (position triangulated from the full track); skipped
    #     when a ZUPT fired this frame, exactly like the reference.
    if cfg.prune_last_chance and not cfg.prediction_only:
        ft = state.features
        lc_table = ft.replace(uv_valid=ft.uv_valid & prune_mask[None, :])
        ct_lc = compact_tracks(lc_table, state.clones.order, cfg.max_track_len)
        live_lc = (ft.fid >= 0) & ~ft.in_state
        cand_lc = live_lc & (ct_lc.n_obs >= 2)
        # triangulate from ALL current observations (initializePosition is
        # called with the feature's full observation set, orcvio.cpp:2784)
        ct_all = compact_tracks(ft, state.clones.order, cfg.max_track_len)
        R_c2w2, t_c_w2 = cam_poses(state)
        Klc = min(cfg.max_update_features, F)
        _, lc_idx = jax.lax.top_k(cand_lc.astype(state.P.dtype), Klc)
        ct_all_k = jax.tree.map(lambda a_: a_[lc_idx], ct_all)
        motion_lc = check_motion(ct_all_k, R_c2w2, t_c_w2,
                                 cfg.tri_translation_threshold)
        tri_lc = triangulate(cfg, ct_all_k, R_c2w2, t_c_w2)
        ct_lc_k = jax.tree.map(lambda a_: a_[lc_idx], ct_lc)
        fj_lc = feature_jacobians(cfg, state, ct_lc_k, tri_lc.p_world)
        gated_lc = gate_features(cfg, state, fj_lc, chi2_table)
        use_lc = (cand_lc[lc_idx] & motion_lc & tri_lc.valid & fj_lc.usable
                  & gated_lc & ~do_zupt & jnp.any(prune_mask))
        state, _ = msckf_update(cfg, state, fj_lc, use_lc)
    if E:
        from .hybrid import remove_state_features as _rm

        if cfg.use_schmidt and cfg.nuisance_cap:
            # Schmidt: demote pruned anchors to nuisance slots first; any
            # anchors that could not demote (no free slot) fall through to
            # removal below
            from .hybrid import schmidt_demote

            state = schmidt_demote(cfg, state, prune_mask)
        # re-anchor surviving features to the current clone (anchor-change
        # branch of pruneImuStateBuffer, orcvio.cpp:2666; covariance via
        # updateFeatureCov_3didp/_1didp); degenerate ones fall through to
        # removal below
        from .hybrid import reanchor_features

        state = reanchor_features(cfg, state, prune_mask, cur_slot)
        ft = state.features
        in_window = ft.anchor_slot < cfg.sw_size
        anchor_pruned = ft.in_state & in_window & prune_mask[
            jnp.clip(ft.anchor_slot, 0, cfg.sw_size - 1)
        ]
        state = _rm(cfg, state, anchor_pruned)
        state = state.replace(features=feat.free_rows(state.features, anchor_pruned))
    state = prune_clones(state, prune_mask)

    out = FrameOutput(
        t=state.t,
        R=state.imu.R,
        p=state.imu.p,
        v=state.imu.v,
        n_update_features=jnp.sum(use).astype(jnp.int32),
        dx_norm=jnp.linalg.norm(dx),
        zupt=do_zupt,
    )
    return state, out


def run_sequence(cfg: FilterConfig, state: FilterState, frames: FrameInput, chi2_table):
    """lax.scan over a whole trajectory of stacked FrameInputs."""

    def step(st, fr):
        return filter_step(cfg, st, fr, chi2_table)

    return jax.lax.scan(step, state, frames)
