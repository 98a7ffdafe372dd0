"""Fully-staged object pipeline: VIO + SORT + ingest + init/LM + EKF update
compiled into ONE `lax.scan` over the sequence.

The host orchestrator (``vio_objects.ObjectVio``) mirrors the reference's
per-frame ROS topology and runs at a few fps on CPU — fine for acceptance
evaluation, unusable for serving. This module is the TPU-native execution
mode: detections are device-resident streams, the whole per-frame flow
(vio_step -> SORT -> keypoint ingest -> [at most one] finalize (triangulate
+ Kabsch + object LM) -> map insert/merge -> object-residual EKF update) is
traced once and scanned. Data-dependent finalization becomes a `lax.cond`
on a carried "pending" mask with a one-object-per-frame budget (object
deaths are sparse; pending rows drain on subsequent frames).

Ref: System.cpp:622-709 + ObjectInitNode.cpp:408-1219 (the blocking
service round-trip becomes a value dependency inside the step function).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config.core import FilterConfig
from ..filter.augment import cam_poses, current_clone_slot
from ..filter.pipeline import FrameInput, build_chi2_table
from ..math import se3
from ..vio import VioState, vio_step
from .manager import ManagerConfig, ObjectTable, PoseHistory, finalize_object, free_rows, ingest, rows_to_finalize
from .sort import SortState, iou_matrix, sort_step
from .update import object_ekf_update
from .vio_objects import ObjectVioConfig


class MapTable(struct.PyTreeNode):
    """Fixed-capacity object map with insert-or-merge semantics."""

    wTo: jnp.ndarray  # (Mc, 4, 4)
    shape: jnp.ndarray  # (Mc, 3)
    kps_world: jnp.ndarray  # (Mc, K, 3)
    class_id: jnp.ndarray  # (Mc,)
    n_obs: jnp.ndarray  # (Mc,) frames of the winning track
    n_tracks: jnp.ndarray  # (Mc,) merged track count
    lm_cost: jnp.ndarray  # (Mc,)
    valid: jnp.ndarray  # (Mc,)

    @classmethod
    def create(cls, capacity: int, n_kps: int, dtype=jnp.float32):
        return cls(
            wTo=jnp.tile(jnp.eye(4, dtype=dtype), (capacity, 1, 1)),
            shape=jnp.zeros((capacity, 3), dtype),
            kps_world=jnp.zeros((capacity, n_kps, 3), dtype),
            class_id=-jnp.ones((capacity,), jnp.int32),
            n_obs=jnp.zeros((capacity,), jnp.int32),
            n_tracks=jnp.zeros((capacity,), jnp.int32),
            lm_cost=jnp.zeros((capacity,), dtype),
            valid=jnp.zeros((capacity,), bool),
        )


def map_insert(mt: MapTable, wTo, shape, kps_world, class_id, n_obs, lm_cost,
               do_insert, merge_distance: float):
    """Insert-or-merge one finalized object (same association as
    ObjectVio._merge_key, in-graph)."""
    c_new = wTo[:3, 3]
    d = jnp.linalg.norm(mt.wTo[:, :3, 3] - c_new[None, :], axis=1)
    cand = mt.valid & (mt.class_id == class_id)
    d = jnp.where(cand, d, jnp.inf)
    near = jnp.argmin(d)
    merged = d[near] < merge_distance
    free_row = jnp.argmin(mt.valid)  # first False (or 0 if full)
    row = jnp.where(merged, near, free_row)
    full = jnp.all(mt.valid) & ~merged
    do = do_insert & ~full
    # on merge, keep the estimate whose track observed more frames
    replace = do & (~merged | (n_obs >= mt.n_obs[row]))

    def upd(field, new):
        return field.at[row].set(jnp.where(replace, new, field[row]))

    return mt.replace(
        wTo=upd(mt.wTo, wTo),
        shape=upd(mt.shape, shape),
        kps_world=upd(mt.kps_world, kps_world),
        class_id=mt.class_id.at[row].set(
            jnp.where(do, class_id, mt.class_id[row])),
        n_obs=upd(mt.n_obs, n_obs),
        lm_cost=upd(mt.lm_cost, lm_cost),
        n_tracks=mt.n_tracks.at[row].add(jnp.where(do, 1, 0)),
        valid=mt.valid.at[row].set(mt.valid[row] | do),
    )


class ObjectsCarry(NamedTuple):
    vio: VioState
    sort: SortState
    table: ObjectTable
    poses: PoseHistory
    pending: jnp.ndarray  # (O,) rows awaiting finalization
    omap: MapTable


class ObjectsStream(NamedTuple):
    """Per-frame detection stream (device-resident, (T, ...) leaves)."""

    boxes: jnp.ndarray  # (T, M, 4) normalized bboxes
    classes: jnp.ndarray  # (T, M) int32
    kps: jnp.ndarray  # (T, M, K, 2)
    kps_mask: jnp.ndarray  # (T, M, K)
    valid: jnp.ndarray  # (T, M)


def make_objects_replay(ocfg: ObjectVioConfig, max_obs: int, map_capacity: int = 32,
                        dtype=jnp.float32):
    """Build replay(carry, frames, stream) -> (carry, outs) staged scan."""
    fcfg = ocfg.filter
    chi2 = build_chi2_table(fcfg, dtype)
    kps_mean = jnp.asarray(ocfg.kps_mean, dtype)
    shape_mean = jnp.asarray(ocfg.shape_mean, dtype)
    mc = ocfg.manager

    def init_carry(vio_state: VioState) -> ObjectsCarry:
        return ObjectsCarry(
            vio=vio_state,
            sort=SortState.create(ocfg.sort, dtype),
            table=ObjectTable.create(mc, dtype),
            poses=PoseHistory.create(mc.pose_history, dtype),
            pending=jnp.zeros((mc.capacity,), bool),
            omap=MapTable.create(map_capacity, mc.n_kps, dtype),
        )

    def step(carry: ObjectsCarry, xs):
        frame, det = xs
        vio, out = vio_step(fcfg, carry.vio, frame, chi2)
        fs = vio.filter
        slot = current_clone_slot(fs)
        R_c2w, t_c_w = cam_poses(fs)
        wTc = se3.make_pose(R_c2w[slot], t_c_w[slot])
        poses = carry.poses.push(wTc, fs.t.astype(dtype))

        sort, sout = sort_step(ocfg.sort, carry.sort, det.boxes, det.classes,
                               det.valid)
        iou = iou_matrix(sout.bboxes, det.boxes)
        live = sout.track_id >= 0
        best_det = jnp.argmax(iou, axis=1)
        has_det = (jnp.max(iou, axis=1) > 0.1) & live & det.valid[best_det]
        kps = det.kps[best_det]
        kps_mask = det.kps_mask[best_det] & has_det[:, None]
        table = ingest(mc, carry.table, fs.t.astype(dtype),
                       jnp.where(has_det, sout.track_id, -1), sout.class_id,
                       sout.bboxes, kps, kps_mask, has_det)

        fin_mask, junk_mask = rows_to_finalize(mc, table, sout.lost_id)
        pending = (carry.pending | fin_mask) & (table.oid >= 0) & ~junk_mask

        def do_finalize(args):
            vio, table, poses, omap, pending = args
            r = jnp.argmax(pending)
            fv = jnp.arange(mc.window) < table.n[r]
            # same TPU-f32 numerics policy as filter_step: the Kabsch SVD +
            # LM normal equations corrupt under default bf16 MXU passes
            with jax.default_matmul_precision("highest"):
                fin, exp, wTc_obj, _ = finalize_object(
                    fcfg, ocfg.lm, table.zs[r], table.zs_mask[r], table.zb[r],
                    table.zb_mask[r], table.t[r], fv, poses, kps_mean,
                    shape_mean, use_ransac=ocfg.use_ransac,
                )
            omap = map_insert(
                omap, fin.wTo, fin.shape, fin.kps_world, table.class_id[r],
                table.n[r], fin.lm_cost, fin.ok,
                ocfg.merge_distance if ocfg.merge_duplicates else 1e-6,
            )
            if ocfg.use_object_residual_update:
                new_fs, used, _diag = object_ekf_update(
                    fcfg, vio.filter, exp, wTc_obj, table.t[r], chi2)
                ok_upd = used & fin.ok
                new_fs = jax.tree.map(
                    lambda a, b: jnp.where(ok_upd, a, b), new_fs, vio.filter)
                vio = vio.replace(filter=new_fs)
            kill = jnp.arange(mc.capacity) == r
            table = free_rows(table, kill)
            pending = pending & ~kill
            return vio, table, poses, omap, pending

        # junk rows are freed once per frame, unconditionally; then a
        # while_loop drains up to finalize_budget pending rows (deaths are
        # sparse; budget 1 matches the original one-per-frame behavior).
        # The while_loop traces do_finalize's heavy body exactly once and
        # executes only while something is actually pending.
        table = free_rows(table, junk_mask)
        pending = pending & ~junk_mask
        budget = max(1, int(ocfg.finalize_budget))

        def w_cond(c):
            i, args = c
            return (i < budget) & jnp.any(args[4])

        def w_body(c):
            i, args = c
            return i + 1, do_finalize(args)

        _, (vio, table, poses, omap, pending) = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.zeros((), jnp.int32), (vio, table, poses, carry.omap, pending)))

        carry = ObjectsCarry(vio=vio, sort=sort, table=table, poses=poses,
                             pending=pending, omap=omap)
        return carry, {"p": out.p, "R": out.R, "n_map": jnp.sum(omap.valid)}

    def replay(carry: ObjectsCarry, frames, stream: ObjectsStream):
        return jax.lax.scan(step, carry, (frames, stream))

    replay.init_carry = init_carry
    return replay
