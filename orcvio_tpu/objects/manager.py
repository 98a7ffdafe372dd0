"""Object observation manager: accumulation, smoothing, finalization.

TPU-native equivalent of the ROS ``ObjectInitNode``
(ros_wrapper/src/orcvio/src/ObjectInitNode.cpp): ``callback_sem`` (:408 —
accumulate per-object keypoint/bbox measurements with per-keypoint KF
smoothing, declare objects lost), ``callback_pose`` (:365 — camera pose
history buffer), and ``do_object_feature_initialization`` (:1037 — on lost
objects: triangulate + Kabsch + object LM + export for the EKF update).
The ROS topic/service plumbing becomes plain pytrees: the manager is a pure
accumulation state machine; finalization is one jitted function per object.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config.core import FilterConfig
from ..math import se3
from .init import object_initialization, object_initialization_lite
from .kf import Kf4State, kf4_create, kf4_position, kf4_step
from .lm import ObjectLMConfig, ObjectLMData, ObjectLMState, export_for_update, optimize


class ManagerConfig(NamedTuple):
    capacity: int = 8  # simultaneous objects
    window: int = 32  # max frames accumulated per object
    n_kps: int = 12  # keypoints per object class (car = 12)
    pose_history: int = 128  # camera pose ring buffer
    min_frames: int = 8  # min_object_feature_track_length
    smooth_keypoints: bool = True


class PoseHistory(struct.PyTreeNode):
    """Ring buffer of camera poses (callback_pose, ObjectInitNode.cpp:365)."""

    wTc: jnp.ndarray  # (H, 4, 4)
    t: jnp.ndarray  # (H,)
    valid: jnp.ndarray  # (H,)
    head: jnp.ndarray  # int32 next write slot

    @classmethod
    def create(cls, cap: int, dtype=jnp.float32):
        return cls(
            wTc=jnp.tile(jnp.eye(4, dtype=dtype), (cap, 1, 1)),
            t=jnp.full((cap,), -1.0, dtype),
            valid=jnp.zeros((cap,), bool),
            head=jnp.zeros((), jnp.int32),
        )

    def push(self, wTc, t):
        i = self.head % self.t.shape[0]
        return self.replace(
            wTc=self.wTc.at[i].set(wTc),
            t=self.t.at[i].set(t),
            valid=self.valid.at[i].set(True),
            head=self.head + 1,
        )

    def lookup(self, times, tol=1e-6):
        """times (T,) -> (wTc (T, 4, 4), found (T,))."""
        d = jnp.abs(times[:, None] - self.t[None, :])
        d = jnp.where(self.valid[None, :], d, jnp.inf)
        idx = jnp.argmin(d, axis=1)
        found = jnp.min(d, axis=1) < tol
        return self.wTc[idx], found


class ObjectTable(struct.PyTreeNode):
    """Fixed-capacity per-object observation windows (ObjectFeature.h:31)."""

    oid: jnp.ndarray  # (O,) int32 external track id, -1 free
    class_id: jnp.ndarray  # (O,)
    zs: jnp.ndarray  # (O, TW, K, 2)
    zs_mask: jnp.ndarray  # (O, TW, K)
    zb: jnp.ndarray  # (O, TW, 4)
    zb_mask: jnp.ndarray  # (O, TW)
    t: jnp.ndarray  # (O, TW)
    n: jnp.ndarray  # (O,) frames filled
    kp_kf: Kf4State  # batched (O, K)

    @classmethod
    def create(cls, mc: ManagerConfig, dtype=jnp.float32):
        O, TW, K = mc.capacity, mc.window, mc.n_kps
        return cls(
            oid=-jnp.ones((O,), jnp.int32),
            class_id=-jnp.ones((O,), jnp.int32),
            zs=jnp.zeros((O, TW, K, 2), dtype),
            zs_mask=jnp.zeros((O, TW, K), bool),
            zb=jnp.zeros((O, TW, 4), dtype),
            zb_mask=jnp.zeros((O, TW), bool),
            t=jnp.zeros((O, TW), dtype),
            n=jnp.zeros((O,), jnp.int32),
            kp_kf=kf4_create((O, K), dtype),
        )


def ingest(mc: ManagerConfig, table: ObjectTable, t, obj_ids, class_ids, bboxes, kps, kps_mask, det_valid):
    """Accumulate one frame of tracked object detections.

    obj_ids: (M,) SORT track ids; bboxes (M, 4); kps (M, K, 2) semantic
    keypoints (kps_mask (M, K)). Ref: callback_sem (ObjectInitNode.cpp:408).
    """
    O = table.oid.shape[0]
    M = obj_ids.shape[0]
    det_valid = det_valid & (obj_ids >= 0)

    live = table.oid >= 0
    eq = (obj_ids[:, None] == table.oid[None, :]) & det_valid[:, None] & live[None, :]
    matched = jnp.any(eq, axis=1)
    row_of = jnp.argmax(eq, axis=1)

    is_new = det_valid & ~matched
    free = ~live
    free_rank = jnp.cumsum(free) - 1
    new_rank = jnp.cumsum(is_new) - 1
    can = is_new & (new_rank < jnp.sum(free))
    rank_to_row = jnp.zeros((O,), jnp.int32).at[jnp.where(free, free_rank, O)].set(
        jnp.arange(O, dtype=jnp.int32), mode="drop"
    )
    row = jnp.where(matched, row_of, rank_to_row[jnp.clip(new_rank, 0, O - 1)])
    write = matched | can
    rows = jnp.where(write, row, O)

    # column per object = current fill count (clamped; full windows stop
    # accumulating — the manager should have finalized them already)
    col = jnp.clip(table.n[jnp.clip(row, 0, O - 1)], 0, mc.window - 1)

    # keypoint KF smoothing per (object, kp) (ObjectFeature.h:46 kp_trackers)
    kf_rows = table.kp_kf
    kf_sel = jax.tree.map(lambda a: a[jnp.clip(row, 0, O - 1)], kf_rows)  # (M, K, ...)
    t_b = jnp.broadcast_to(t, (M, mc.n_kps))
    kf_new = kf4_step(kf_sel, kps, t_b, kps_mask & write[:, None])
    kps_out = kf4_position(kf_new) if mc.smooth_keypoints else kps
    kps_out = jnp.where(kps_mask[..., None], kps_out, 0.0)

    zs = table.zs.at[rows, col].set(kps_out, mode="drop")
    zs_mask = table.zs_mask.at[rows, col].set(kps_mask, mode="drop")
    zb = table.zb.at[rows, col].set(bboxes, mode="drop")
    zb_mask = table.zb_mask.at[rows, col].set(True, mode="drop")
    tcol = table.t.at[rows, col].set(t, mode="drop")
    n = table.n.at[jnp.where(write, row, O)].add(1, mode="drop")
    oid = table.oid.at[jnp.where(can, row, O)].set(obj_ids, mode="drop")
    cid = table.class_id.at[jnp.where(can, row, O)].set(class_ids, mode="drop")
    kp_kf = jax.tree.map(
        lambda full, new: full.at[rows].set(new, mode="drop"), kf_rows, kf_new
    )
    return table.replace(
        oid=oid, class_id=cid, zs=zs, zs_mask=zs_mask, zb=zb, zb_mask=zb_mask,
        t=tcol, n=n, kp_kf=kp_kf,
    )


def rows_to_finalize(mc: ManagerConfig, table: ObjectTable, lost_ids):
    """Rows ready for init+LM: SORT-lost or window-full, with enough frames.

    Ref: lost_flag / track-length handling (ObjectInitNode.cpp:650-740).
    """
    lost = jnp.isin(table.oid, lost_ids) & (table.oid >= 0)
    full = table.n >= mc.window
    enough = table.n >= mc.min_frames
    return (lost | full) & enough, (lost | full) & ~enough


def free_rows(table: ObjectTable, kill_mask):
    O = table.oid.shape[0]
    return table.replace(
        oid=jnp.where(kill_mask, -1, table.oid),
        n=jnp.where(kill_mask, 0, table.n),
        zs_mask=table.zs_mask & ~kill_mask[:, None, None],
        zb_mask=table.zb_mask & ~kill_mask[:, None],
        kp_kf=jax.tree.map(
            lambda a: jnp.where(
                kill_mask.reshape((O,) + (1,) * (a.ndim - 1)),
                jnp.zeros_like(a) if a.dtype != bool else False,
                a,
            ),
            table.kp_kf,
        ),
    )


class FinalizedObject(NamedTuple):
    wTo: jnp.ndarray  # (4, 4)
    shape: jnp.ndarray  # (3,)
    kps_world: jnp.ndarray  # (K, 3)
    ok: jnp.ndarray  # bool
    lm_cost: jnp.ndarray


def finalize_object(
    cfg: FilterConfig,
    lmc: ObjectLMConfig,
    zs, zs_mask, zb, zb_mask, frame_t, frame_valid,
    poses: PoseHistory,
    kps_mean, shape_mean,
    use_ransac=True,
):
    """Triangulate + Kabsch + LM for one object window; returns state + export.

    Ref: do_object_feature_initialization (ObjectInitNode.cpp:1037-1219).
    """
    wTc, found = poses.lookup(frame_t)
    frame_ok = frame_valid & found
    zs_m = zs_mask & frame_ok[:, None]
    zb_m = zb_mask & frame_ok

    R_c2w = wTc[:, :3, :3]
    t_c_w = wTc[:, :3, 3]
    if lmc.lite:
        # bbox-only init from the first valid bbox observation
        # (single_object_initialization_lite, ObjectFeatureInitializer.cpp:497)
        first = jnp.argmax(zb_m)
        cTw_f = se3.inverse_pose(wTc[first])
        wTo0, init_ok = object_initialization_lite(
            zb[first], cTw_f[:3, :3], wTc[first, :3, 3], shape_mean
        )
        init_ok = init_ok & jnp.any(zb_m)
    else:
        wTq, init_ok, kps_w, kps_valid = object_initialization(
            cfg, zs, zs_m, R_c2w, t_c_w, kps_mean, use_ransac=use_ransac,
            zb=zb, zb_mask=zb_m, shape_ellipsoid=shape_mean,
        )
        # orthonormalize the (scaled) Kabsch linear part for the manifold state
        U, _, Vt = jnp.linalg.svd(wTq[:3, :3])
        wTo0 = se3.make_pose(U @ Vt, wTq[:3, 3])

    st0 = ObjectLMState(wTo=wTo0, shape=shape_mean, kps=kps_mean)
    data = ObjectLMData(
        cTw=se3.inverse_pose(wTc),
        zs=zs, zs_mask=zs_m, zb=zb, zb_mask=zb_m,
        frame_mask=frame_ok,
        kps_mean=kps_mean, shape_mean=shape_mean,
    )
    st, cost, n_acc = optimize(lmc, st0, data)
    ok = init_ok & jnp.isfinite(cost) & jnp.all(jnp.isfinite(st.wTo))
    exp = export_for_update(lmc, st, data)
    kps_world = jnp.einsum("ij,kj->ki", st.wTo[:3, :3], st.kps) + st.wTo[:3, 3]
    fin = FinalizedObject(wTo=st.wTo, shape=st.shape, kps_world=kps_world, ok=ok, lm_cost=cost)
    return fin, exp, wTc, data
