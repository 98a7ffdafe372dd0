"""Multi-object object-mapping evaluation on a synthetic world.

The acceptance artifact for the object half of the framework: drive the FULL
ObjectVio pipeline (VIO + SORT + keypoint ingestion + triangulation/Kabsch +
object LM + object-residual EKF update) over a trajectory orbiting N ground
-truth cars, persist the object map, and score it with the reference's Unity
protocol — nearest-GT association, mean 3D IoU over matches with IoU > 0.2
(python_scripts/object_map_eval/unity_object_iou_eval.py:41-74) — plus the
position/rotation precision table (utils.py:330-416).

Detections are analytic projections of the GT objects (the Unity pipeline's
role: the detector is an input to the mapping system, not the thing under
evaluation); scripts/object_map_eval.py adds a CNN-in-the-loop variant where
StarMap keypoints come from rendered images.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config.core import FilterConfig
from ..dataio.render_object import CAR_KEYPOINTS
from ..dataio.synthetic import SimConfig, generate, trajectory_pose
from ..filter.state import FilterState
from ..math import se3, so3
from ..objects import residuals as RS
from ..objects.lm import ObjectLMConfig
from ..objects.manager import ManagerConfig
from ..objects.sort import SortConfig
from ..objects.vio_objects import ObjectVio, ObjectVioConfig
from .objects import match_and_mean_iou, precision_recall_table, yaw_of_pose


@dataclass
class WorldConfig:
    n_objects: int = 12
    n_frames: int = 300          # ~15 s at 20 Hz: a bit over one full orbit
    ring_radius: float = 7.0     # object ring around the trajectory center
    seed: int = 7
    kp_noise: float = 1.5e-3     # normalized-coordinate keypoint noise
    uv_noise: float = 0.002      # VIO feature noise
    max_det: int = 8             # detection slots per frame
    fov: float = 0.9
    min_depth: float = 2.0
    max_depth: float = 14.0


def make_world(wc: WorldConfig):
    """GT objects on a ring around the trajectory center (0, radius, 0)."""
    rng = np.random.default_rng(wc.seed)
    n = wc.n_objects
    az = np.linspace(0, 2 * np.pi, n, endpoint=False) + rng.uniform(-0.1, 0.1, n)
    center = np.array([0.0, 3.0, 0.0])
    objs = []
    for i in range(n):
        scale = rng.uniform(0.9, 1.1)
        kps_gt = CAR_KEYPOINTS * scale + rng.normal(size=(12, 3)) * 0.02
        shape_gt = np.array([0.80, 2.00, 0.70]) * scale  # ellipsoid semi-axes
        yaw = rng.uniform(-np.pi, np.pi)
        t = center + np.array([wc.ring_radius * np.cos(az[i]),
                               wc.ring_radius * np.sin(az[i]),
                               0.0])
        wTo = np.asarray(se3.make_pose(
            so3.exp(jnp.asarray([0.0, 0.0, yaw])), jnp.asarray(t)))
        objs.append(dict(kps=kps_gt, shape=shape_gt, wTo=wTo, yaw=yaw, t=t,
                         scale=scale))
    return objs


def ellipsoid_bbox(cTw, wTo, shape):
    """Projected bbox of the ellipsoid (the reference's quadric projection)."""
    Qi = RS.ellipse_from_shape(jnp.asarray(shape))
    P_o = jnp.einsum("ij,jk->ik", cTw[:3, :], jnp.asarray(wTo))
    C = np.asarray(P_o @ Qi @ P_o.T)
    det_ok = abs(C[2, 2]) > 1e-9
    if not det_ok:
        return None
    sx = np.sqrt(max(C[0, 2] ** 2 - C[2, 2] * C[0, 0], 1e-12)) / abs(C[2, 2])
    sy = np.sqrt(max(C[1, 2] ** 2 - C[2, 2] * C[1, 1], 1e-12)) / abs(C[2, 2])
    cx = C[0, 2] / C[2, 2]
    cy = C[1, 2] / C[2, 2]
    return np.array([cx - sx, cy - sy, cx + sx, cy + sy])


def analytic_detections(wc: WorldConfig, objs, wTc, rng):
    """Per-frame detection set: visible objects' keypoints + bboxes."""
    cTw = np.asarray(se3.inverse_pose(jnp.asarray(wTc)))
    M = wc.max_det
    boxes = np.zeros((M, 4))
    classes = np.zeros(M, np.int32)
    kps = np.zeros((M, 12, 2))
    kmask = np.zeros((M, 12), bool)
    valid = np.zeros(M, bool)
    truth = -np.ones(M, np.int32)
    m = 0
    for i, ob in enumerate(objs):
        if m >= M:
            break
        pc = cTw[:3, :3] @ ob["t"] + cTw[:3, 3]
        if not (wc.min_depth < pc[2] < wc.max_depth):
            continue
        if abs(pc[0] / pc[2]) > wc.fov or abs(pc[1] / pc[2]) > wc.fov:
            continue
        bb = ellipsoid_bbox(jnp.asarray(cTw), ob["wTo"], ob["shape"])
        if bb is None:
            continue
        kw = (ob["wTo"][:3, :3] @ ob["kps"].T).T + ob["wTo"][:3, 3]
        kc = (cTw[:3, :3] @ kw.T).T + cTw[:3, 3]
        z = kc[:, 2]
        uv = kc[:, :2] / z[:, None]
        vis = z > wc.min_depth * 0.8
        boxes[m] = bb
        kps[m] = uv + rng.normal(size=uv.shape) * wc.kp_noise
        kmask[m] = vis
        valid[m] = True
        truth[m] = i
        m += 1
    return boxes, classes, kps, kmask, valid, truth


def run_object_mapping(wc: WorldConfig, use_object_update: bool = True,
                       dtype=jnp.float64, sigma_obj: float | None = None,
                       transport: bool = True, smooth_keypoints: bool = True,
                       merge_duplicates: bool = True,
                       collect_diag: bool = False):
    """Full pipeline run; returns dict with iou stats, ATE, and the map."""
    rng = np.random.default_rng(wc.seed + 1)
    objs = make_world(wc)
    sim = SimConfig(n_frames=wc.n_frames, n_landmarks=400, max_obs=50,
                    uv_noise=wc.uv_noise, seed=wc.seed, radius=3.0, omega=0.5)
    R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]],
                        dtype)
    t_c_b = jnp.asarray([0.05, 0.02, 0.0], dtype)
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
    gt_R = np.asarray(data.gt_R)
    gt_p = np.asarray(data.gt_p)

    fkw = dict(sw_size=10, max_features=80, max_track_len=6,
               imu_slab=sim.imu_slab, observation_noise=0.004,
               tri_translation_threshold=-1.0,
               object_residual_transport=transport)
    if sigma_obj is not None:
        fkw["object_observation_noise"] = sigma_obj
    fcfg = FilterConfig(**fkw)
    ocfg = ObjectVioConfig(
        filter=fcfg,
        lm=ObjectLMConfig(iters=25),
        manager=ManagerConfig(capacity=wc.max_det + 4, window=45, n_kps=12,
                              pose_history=256, min_frames=12,
                              smooth_keypoints=smooth_keypoints),
        sort=SortConfig(capacity=wc.max_det + 4, max_age=3, min_hits=2,
                        iou_threshold=0.1),
        kps_mean=tuple(map(tuple, CAR_KEYPOINTS)),
        shape_mean=(0.80, 2.00, 0.70),
        use_object_residual_update=use_object_update,
        merge_duplicates=merge_duplicates,
    )
    ov = ObjectVio(ocfg, max_obs=sim.max_obs, dtype=dtype)

    diag_log: List[dict] = []
    if collect_diag:
        def _hook(oid, fs_before, fs_after, used, diag, entry):
            # clone position error vs GT before/after this update
            tb = np.asarray(fs_before.clones.t)
            val = np.asarray(fs_before.clones.valid)
            idx = np.clip(np.rint(tb * sim.frame_hz).astype(int) - 1, 0,
                          wc.n_frames - 1)
            gt = gt_p[idx]
            eb = np.linalg.norm(np.asarray(fs_before.clones.p) - gt, axis=1)
            ea = np.linalg.norm(np.asarray(fs_after.clones.p) - gt, axis=1)
            diag_log.append(dict(
                oid=int(oid), used=bool(used),
                gamma=float(diag.gamma), dof=int(diag.dof),
                threshold=float(diag.threshold), n_rows=int(diag.n_rows),
                n_frames=int(diag.n_frames),
                dx_clone_p=float(diag.dx_clone_p),
                err_before=float(np.mean(eb[val])),
                err_after=float(np.mean(ea[val])),
                r_rms=float(diag.r_rms), rp_rms=float(diag.rp_rms),
                h_max=float(diag.h_max), lm_cost=entry["lm_cost"],
                n_obs_frames=len(entry["timestamps"]),
            ))
        ov.update_hook = _hook

    # GT-initialized filter (initial_use_gt mode, orcvio.cpp:123-146)
    st = FilterState.create(fcfg, dtype)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0.astype(dtype), p=p0.astype(dtype),
                         v=v0.astype(dtype))
    d = np.asarray(fcfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c,
                    t_c_b=t_c_b, P=jnp.asarray(np.diag(d), dtype),
                    initialized=jnp.ones((), bool))
    ov.set_filter_state(st)

    est_p = np.zeros((wc.n_frames, 3))
    for k in range(wc.n_frames):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        Rc2w = gt_R[k] @ np.asarray(R_b2c).T
        tcw = gt_p[k] + gt_R[k] @ np.asarray(t_c_b)
        wTc = np.eye(4)
        wTc[:3, :3] = Rc2w
        wTc[:3, 3] = tcw
        boxes, classes, kps, kmask, valid, _ = analytic_detections(
            wc, objs, wTc, rng)
        out = ov.step(fr, boxes, classes, kps, kmask, valid)
        est_p[k] = np.asarray(out.p)
    # flush: a few empty frames so SORT ages out every live track
    last = jax.tree.map(lambda x: x[wc.n_frames - 1], data.frames)
    for _ in range(ocfg.sort.max_age + 2):
        z = np.zeros((wc.max_det, 4))
        ov.step(last, z, np.zeros(wc.max_det, np.int32),
                np.zeros((wc.max_det, 12, 2)), np.zeros((wc.max_det, 12), bool),
                np.zeros(wc.max_det, bool))

    # score with the Unity protocol
    est_list = [
        dict(t=np.asarray(o["wTo"])[:3, 3],
             yaw=yaw_of_pose(np.asarray(o["wTo"])),
             shape=(2 * o["shape"][2], 2 * o["shape"][1], 2 * o["shape"][0]))
        for o in ov.object_map.values()
    ]
    gt_list = [
        dict(t=o["t"], yaw=yaw_of_pose(o["wTo"]),
             shape=(2 * o["shape"][2], 2 * o["shape"][1], 2 * o["shape"][0]))
        for o in objs
    ]
    mean_iou, n_matched, pairs = match_and_mean_iou(est_list, gt_list)
    pr = precision_recall_table(
        [p[2]["t"] for p in pairs], [p[2]["yaw"] for p in pairs],
        [p[1]["t"] for p in pairs], [p[1]["yaw"] for p in pairs],
    ) if pairs else {}
    ate = float(np.sqrt(np.mean(np.sum((est_p - gt_p) ** 2, axis=1))))
    return dict(mean_iou=mean_iou, n_matched=n_matched, n_est=len(est_list),
                n_gt=len(gt_list), pairs=pairs, pr=pr, ate_m=ate,
                object_map=ov.object_map, est_p=est_p, gt_p=gt_p,
                diag=diag_log)
