"""OrcVIO mode: the full VIO + object pipeline orchestrator.

TPU-native equivalent of the reference's two-nodelet topology
(``ros_wrapper/src/orcvio/src/System.cpp`` — VIO + blocking object service —
and ``ObjectInitNode.cpp`` — SORT-fed accumulation + init + LM): one
host-side orchestrator invoking jitted stages. The ROS topics/service become
function calls; per-frame flow mirrors §3.4 of SURVEY.md:

    detections -> SORT -> keypoint ingest (per-kp KF) -> [on lost object]
    triangulate + Kabsch + object LM -> object-residual EKF update of the
    sliding window (use_object_residual_update_cam_pose_flag).
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.core import FilterConfig
from ..filter.augment import cam_poses, current_clone_slot
from ..filter.pipeline import FrameInput, build_chi2_table
from ..math import se3
from ..vio import VioState, vio_step
from .lm import ObjectLMConfig
from .manager import (
    ManagerConfig,
    ObjectTable,
    PoseHistory,
    finalize_object,
    ingest,
    rows_to_finalize,
    free_rows,
)
from .sort import SortConfig, SortState, iou_matrix, sort_step
from .update import object_ekf_update


class ObjectVioConfig(NamedTuple):
    filter: FilterConfig
    lm: ObjectLMConfig
    manager: ManagerConfig
    sort: SortConfig
    kps_mean: tuple  # (K, 3) class mean keypoints
    shape_mean: tuple  # (3,)
    use_object_residual_update: bool = True  # use_object_residual_update_cam_pose_flag
    use_ransac: bool = True
    # merge re-finalized tracks of the same physical object: a new estimate
    # whose center lands within merge_distance of an existing same-class map
    # entry replaces/updates that entry instead of creating a duplicate.
    # (The reference keys its map by SORT track id and re-entries of the same
    # car spawn new entries — see ObjectInitNode.cpp:986-1035; this is map
    # hygiene the reference lacks.)
    merge_duplicates: bool = False
    merge_distance: float = 2.0
    # staged scan: max objects finalized per frame (objects/staged.py). One
    # suffices for sparse deaths; dense scenes drain the pending mask faster
    # with 2-3 at the cost of tracing the finalize body that many times.
    finalize_budget: int = 1


class ObjectVio:
    """Host orchestrator. Keeps jitted stage functions + pytree states."""

    def __init__(self, cfg: ObjectVioConfig, max_obs: int, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.vio = VioState.create(cfg.filter, max_obs, dtype)
        self.sort = SortState.create(cfg.sort, dtype)
        self.table = ObjectTable.create(cfg.manager, dtype)
        self.poses = PoseHistory.create(cfg.manager.pose_history, dtype)
        self.chi2 = build_chi2_table(cfg.filter, dtype)
        self.kps_mean = jnp.asarray(cfg.kps_mean, dtype)
        self.shape_mean = jnp.asarray(cfg.shape_mean, dtype)
        self.object_map: Dict[int, dict] = {}
        # optional host-side hook called after every attempted object EKF
        # update: hook(oid, fs_before, fs_after, used, diag: UpdateDiag)
        self.update_hook = None

        fcfg = cfg.filter
        self._vio_step = jax.jit(lambda s, f: vio_step(fcfg, s, f, self.chi2))
        scfg = cfg.sort
        self._sort_step = jax.jit(lambda s, b, c, v: sort_step(scfg, s, b, c, v))
        mcfg = cfg.manager
        self._ingest = jax.jit(
            lambda tb, t, oid, cid, bb, kp, km, v: ingest(mcfg, tb, t, oid, cid, bb, kp, km, v)
        )
        lmc = cfg.lm

        def _finalize(zs, zs_mask, zb, zb_mask, ft, fv, poses):
            return finalize_object(
                fcfg, lmc, zs, zs_mask, zb, zb_mask, ft, fv, poses,
                self.kps_mean, self.shape_mean, use_ransac=cfg.use_ransac,
            )

        self._finalize = jax.jit(_finalize)
        self._obj_update = jax.jit(
            lambda st, exp, wTc, t: object_ekf_update(fcfg, st, exp, wTc, t, self.chi2)
        )

    def set_filter_state(self, filter_state):
        self.vio = self.vio.replace(filter=filter_state)

    def _merge_key(self, oid: int, entry: dict) -> int:
        """Map key for a finalized estimate: an existing same-class entry
        within merge_distance (3D center), else the new track id."""
        c_new = entry["wTo"][:3, 3]
        best, best_d = oid, self.cfg.merge_distance
        for k, e in self.object_map.items():
            if e["class_id"] != entry["class_id"]:
                continue
            d = float(np.linalg.norm(e["wTo"][:3, 3] - c_new))
            if d < best_d:
                best, best_d = k, d
        return best

    def _merged(self, oid: int, entry: dict) -> dict:
        """Combine with an existing entry under the same key: keep the
        estimate supported by more frames, accumulate the union of
        timestamps and the number of merged tracks."""
        old = self.object_map.get(oid)
        if old is None:
            entry["n_tracks"] = 1
            return entry
        keep = entry if len(entry["timestamps"]) >= len(old["timestamps"]) else old
        out = dict(keep)
        out["timestamps"] = sorted(set(old["timestamps"]) | set(entry["timestamps"]))
        out["n_tracks"] = old.get("n_tracks", 1) + 1
        if old.get("ekf_update_applied"):
            out["ekf_update_applied"] = True
        return out

    def step_image(self, frame: FrameInput, img, det_boxes_px, det_classes,
                   det_valid, detector):
        """One camera frame from a RAW image + pixel-space 2D detections.

        Runs the StarMap keypoint detector (objects/detector.py) on each
        bbox crop — the in-process analogue of the reference's
        darknet -> StarMap -> ObjectInitNode chain — then the normal step().
        detector: StarMapKeypointDetector (carries the camera intrinsics).
        """
        # drop tiny boxes (too few pixels for keypoints); truncated boxes at
        # the border are kept — their ~80 px-error keypoints (round-4
        # measurement) are now absorbed by the trimmed re-triangulation +
        # object-scale RANSAC consensus, and dropping them costs whole
        # objects whose visibility window is short
        Hh, Ww = np.asarray(img).shape
        b0 = np.asarray(det_boxes_px, np.float64)
        big_enough = ((b0[:, 2] - b0[:, 0] > 16) & (b0[:, 3] - b0[:, 1] > 9))
        det_valid = np.asarray(det_valid) & big_enough
        det_kps, det_kps_mask = detector(img, det_boxes_px, det_valid)
        fx, fy, cx, cy = detector.K_cam
        b = b0
        boxes_norm = np.stack([(b[:, 0] - cx) / fx, (b[:, 1] - cy) / fy,
                               (b[:, 2] - cx) / fx, (b[:, 3] - cy) / fy], axis=1)
        return self.step(frame, boxes_norm, det_classes, det_kps,
                         det_kps_mask, det_valid)

    def step(self, frame: FrameInput, det_boxes, det_classes, det_kps, det_kps_mask, det_valid):
        """One camera frame with object detections.

        det_boxes: (M, 4) normalized-coordinate bboxes; det_kps: (M, K, 2)
        semantic keypoints; masks accordingly. Returns the frame output.
        """
        cfg = self.cfg
        self.vio, out = self._vio_step(self.vio, frame)

        # record the camera pose for the object mapper (callback_pose)
        fs = self.vio.filter
        slot = int(current_clone_slot(fs))
        R_c2w, t_c_w = cam_poses(fs)
        wTc = se3.make_pose(R_c2w[slot], t_c_w[slot])
        self.poses = self.poses.push(wTc, jnp.asarray(float(fs.t), self.dtype))

        # SORT tracking
        self.sort, sout = self._sort_step(
            self.sort, jnp.asarray(det_boxes, self.dtype),
            jnp.asarray(det_classes, jnp.int32), jnp.asarray(det_valid),
        )

        # associate detections to live tracks by IoU for keypoint ingestion
        # (the reference's TrackedBBoxListWithKeypoints carries this pairing)
        det_boxes_j = jnp.asarray(det_boxes, self.dtype)
        iou = iou_matrix(sout.bboxes, det_boxes_j)  # (C, M)
        live = sout.track_id >= 0
        best_det = jnp.argmax(iou, axis=1)
        has_det = (jnp.max(iou, axis=1) > 0.1) & live & jnp.asarray(det_valid)[best_det]
        kps = jnp.asarray(det_kps, self.dtype)[best_det]
        kps_mask = jnp.asarray(det_kps_mask)[best_det] & has_det[:, None]
        self.table = self._ingest(
            self.table, jnp.asarray(float(fs.t), self.dtype),
            jnp.where(has_det, sout.track_id, -1), sout.class_id,
            sout.bboxes, kps, kps_mask, has_det,
        )

        # finalize lost / full objects (do_object_feature_initialization)
        lost_ids = jnp.asarray(np.asarray(sout.lost_id), jnp.int32)
        fin_mask, junk_mask = rows_to_finalize(cfg.manager, self.table, lost_ids)
        fin_rows = np.nonzero(np.asarray(fin_mask))[0]
        for row in fin_rows:
            r = int(row)
            fv = jnp.arange(cfg.manager.window) < self.table.n[r]
            fin, exp, wTc_obj, data = self._finalize(
                self.table.zs[r], self.table.zs_mask[r], self.table.zb[r],
                self.table.zb_mask[r], self.table.t[r], fv, self.poses,
            )
            if bool(fin.ok):
                oid = int(self.table.oid[r])
                entry = dict(
                    wTo=np.asarray(fin.wTo), shape=np.asarray(fin.shape),
                    kps_world=np.asarray(fin.kps_world), lm_cost=float(fin.lm_cost),
                    class_id=int(self.table.class_id[r]),
                    timestamps=np.asarray(self.table.t[r])[: int(self.table.n[r])].tolist(),
                )
                if cfg.merge_duplicates:
                    oid = self._merge_key(oid, entry)
                self.object_map[oid] = self._merged(oid, entry)
                if cfg.use_object_residual_update:
                    new_fs, used, diag = self._obj_update(
                        self.vio.filter, exp, wTc_obj, self.table.t[r]
                    )
                    if self.update_hook is not None:
                        self.update_hook(oid, self.vio.filter, new_fs,
                                         bool(used), diag, entry)
                    if bool(used):
                        self.vio = self.vio.replace(filter=new_fs)
                        self.object_map[oid]["ekf_update_applied"] = True
        kill = fin_mask | junk_mask
        if bool(jnp.any(kill)):
            self.table = free_rows(self.table, kill)
        return out
