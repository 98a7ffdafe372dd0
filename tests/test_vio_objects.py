"""End-to-end OrcVIO mode: VIO + SORT + object accumulation + LM + object
EKF update on a synthetic world with a ground-truth object."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.filter.state import FilterState
from orcvio_tpu.math import se3, so3
from orcvio_tpu.objects import residuals as RS
from orcvio_tpu.objects.lm import ObjectLMConfig
from orcvio_tpu.objects.manager import ManagerConfig
from orcvio_tpu.objects.sort import SortConfig
from orcvio_tpu.objects.vio_objects import ObjectVio, ObjectVioConfig

RNG = np.random.default_rng(23)


@pytest.mark.slow
def test_orcvio_mode_end_to_end():
    K_kps = 8
    n_frames = 60
    det_until = 45  # object leaves detection after this frame -> SORT loses it
    sim = SimConfig(n_frames=n_frames, n_landmarks=300, max_obs=50, uv_noise=0.002,
                    seed=3, radius=2.0, omega=0.5)
    fcfg = FilterConfig(sw_size=10, max_features=80, max_track_len=6,
                        imu_slab=sim.imu_slab, observation_noise=0.004,
                        tri_translation_threshold=-1.0)
    R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    t_c_b = jnp.asarray([0.05, 0.02, 0.0])
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)

    # ground-truth object ahead of the early trajectory
    kps_mean = jnp.asarray(RNG.normal(size=(K_kps, 3)) * 0.7)
    kps_gt = kps_mean + jnp.asarray(RNG.normal(size=(K_kps, 3)) * 0.03)
    shape_gt = jnp.asarray([1.5, 0.9, 0.7])
    wTo_gt = se3.make_pose(so3.exp(jnp.asarray([0.05, 0.1, 0.6])), jnp.asarray([6.0, 1.5, 0.3]))

    # per-frame detections from GT camera poses
    gt_R = np.asarray(data.gt_R)
    gt_p = np.asarray(data.gt_p)
    wTc_all = []
    for k in range(n_frames):
        Rc2w = gt_R[k] @ np.asarray(R_b2c).T
        tcw = gt_p[k] + gt_R[k] @ np.asarray(t_c_b)
        wTc_all.append(np.asarray(se3.make_pose(jnp.asarray(Rc2w), jnp.asarray(tcw))))
    wTc_all = jnp.asarray(np.stack(wTc_all))
    cTw_all = se3.inverse_pose(wTc_all)
    zs_all = RS.feature_residual(wTo_gt, kps_gt, cTw_all, jnp.zeros((n_frames, K_kps, 2)),
                                 jnp.ones((n_frames, K_kps), bool))
    zs_all = zs_all + jnp.asarray(RNG.normal(size=zs_all.shape) * 1.5e-3)
    Qi = RS.ellipse_from_shape(shape_gt)
    P_o = jnp.einsum("tij,jk->tik", cTw_all[:, :3, :], wTo_gt)
    C = jnp.einsum("tij,jk,tlk->til", P_o, Qi, P_o)
    Cn = np.asarray(C)
    sx = np.sqrt(np.maximum(Cn[:, 0, 2] ** 2 - Cn[:, 2, 2] * Cn[:, 0, 0], 1e-12)) / np.abs(Cn[:, 2, 2])
    sy = np.sqrt(np.maximum(Cn[:, 1, 2] ** 2 - Cn[:, 2, 2] * Cn[:, 1, 1], 1e-12)) / np.abs(Cn[:, 2, 2])
    cx = Cn[:, 0, 2] / Cn[:, 2, 2]
    cy = Cn[:, 1, 2] / Cn[:, 2, 2]
    zb_all = np.stack([cx - sx, cy - sy, cx + sx, cy + sy], axis=1)

    # depth sanity: object must be in front for detected frames
    depth = np.asarray(jnp.einsum("tij,j->ti", cTw_all, jnp.append(wTo_gt[:3, 3], 1.0)))[:, 2]
    detectable = (depth > 2.0) & (np.arange(n_frames) < det_until)
    assert detectable[:20].all(), "test geometry broken: object not visible early"

    ocfg = ObjectVioConfig(
        filter=fcfg,
        lm=ObjectLMConfig(iters=25),
        manager=ManagerConfig(capacity=4, window=det_until, n_kps=K_kps,
                              pose_history=128, min_frames=10, smooth_keypoints=False),
        sort=SortConfig(capacity=8, max_age=2, min_hits=2, iou_threshold=0.1),
        kps_mean=tuple(map(tuple, np.asarray(kps_mean))),
        shape_mean=tuple(np.asarray(shape_gt)),
        use_object_residual_update=True,
    )
    ov = ObjectVio(ocfg, max_obs=sim.max_obs, dtype=jnp.float64)

    # GT-initialized filter
    st = FilterState.create(fcfg, jnp.float64)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    d = np.asarray(fcfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c, t_c_b=t_c_b,
                    P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
    ov.set_filter_state(st)

    M_det = 2
    for k in range(n_frames):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        if detectable[k]:
            boxes = np.zeros((M_det, 4))
            boxes[0] = zb_all[k]
            classes = np.zeros(M_det, np.int32)
            kps = np.zeros((M_det, K_kps, 2))
            kps[0] = np.asarray(zs_all[k])
            kmask = np.zeros((M_det, K_kps), bool)
            kmask[0] = True
            valid = np.asarray([True, False])
        else:
            boxes = np.zeros((M_det, 4))
            classes = np.zeros(M_det, np.int32)
            kps = np.zeros((M_det, K_kps, 2))
            kmask = np.zeros((M_det, K_kps), bool)
            valid = np.asarray([False, False])
        out = ov.step(fr, boxes, classes, kps, kmask, valid)

    # the object must be in the map, near ground truth
    assert len(ov.object_map) >= 1, "no object finalized"
    obj = list(ov.object_map.values())[0]
    dr, dt = se3.displacement(jnp.asarray(obj["wTo"]), wTo_gt)
    assert float(dt) < 0.4, float(dt)
    assert float(dr) < 0.15, float(dr)
    # the object-residual EKF update was applied to the window
    assert obj.get("ekf_update_applied", False)
    # VIO stayed on track
    err = np.linalg.norm(np.asarray(ov.vio.filter.imu.p) - gt_p[-1])
    assert err < 0.5, err


@pytest.mark.slow
def test_orcvio_lite_mode_end_to_end():
    """OrcVIO-lite: bbox-only detections (no semantic keypoints), lite init +
    lite LM (pose+shape), loosely coupled (no object EKF update).

    Ref: ObjectInitNode lite configuration (ObjectInitNode.cpp:1172-1178,
    single_object_initialization_lite + single_levenberg_marquardt_lite)."""
    K_kps = 8
    n_frames = 50
    det_until = 38
    sim = SimConfig(n_frames=n_frames, n_landmarks=300, max_obs=50, uv_noise=0.002,
                    seed=5, radius=2.0, omega=0.5)
    fcfg = FilterConfig(sw_size=10, max_features=80, max_track_len=6,
                        imu_slab=sim.imu_slab, observation_noise=0.004,
                        tri_translation_threshold=-1.0)
    R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    t_c_b = jnp.asarray([0.05, 0.02, 0.0])
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)

    # lite init assumes identity object rotation -> GT rotation = I
    shape_gt = jnp.asarray([1.5, 0.9, 0.7])
    wTo_gt = jnp.eye(4).at[:3, 3].set(jnp.asarray([6.0, 1.5, 0.3]))

    gt_R = np.asarray(data.gt_R)
    gt_p = np.asarray(data.gt_p)
    wTc_all = []
    for k in range(n_frames):
        Rc2w = gt_R[k] @ np.asarray(R_b2c).T
        tcw = gt_p[k] + gt_R[k] @ np.asarray(t_c_b)
        wTc_all.append(np.asarray(se3.make_pose(jnp.asarray(Rc2w), jnp.asarray(tcw))))
    wTc_all = jnp.asarray(np.stack(wTc_all))
    cTw_all = se3.inverse_pose(wTc_all)
    Qi = RS.ellipse_from_shape(shape_gt)
    P_o = jnp.einsum("tij,jk->tik", cTw_all[:, :3, :], wTo_gt)
    C = jnp.einsum("tij,jk,tlk->til", P_o, Qi, P_o)
    Cn = np.asarray(C)
    sx = np.sqrt(np.maximum(Cn[:, 0, 2] ** 2 - Cn[:, 2, 2] * Cn[:, 0, 0], 1e-12)) / np.abs(Cn[:, 2, 2])
    sy = np.sqrt(np.maximum(Cn[:, 1, 2] ** 2 - Cn[:, 2, 2] * Cn[:, 1, 1], 1e-12)) / np.abs(Cn[:, 2, 2])
    cx = Cn[:, 0, 2] / Cn[:, 2, 2]
    cy = Cn[:, 1, 2] / Cn[:, 2, 2]
    zb_all = np.stack([cx - sx, cy - sy, cx + sx, cy + sy], axis=1)

    depth = np.asarray(jnp.einsum("tij,j->ti", cTw_all, jnp.append(wTo_gt[:3, 3], 1.0)))[:, 2]
    detectable = (depth > 2.0) & (np.arange(n_frames) < det_until)
    assert detectable[:20].all(), "test geometry broken: object not visible early"

    ocfg = ObjectVioConfig(
        filter=fcfg,
        lm=ObjectLMConfig(iters=25, lite=True),
        manager=ManagerConfig(capacity=4, window=det_until, n_kps=K_kps,
                              pose_history=128, min_frames=10, smooth_keypoints=False),
        sort=SortConfig(capacity=8, max_age=2, min_hits=2, iou_threshold=0.1),
        kps_mean=tuple(map(tuple, np.zeros((K_kps, 3)))),
        shape_mean=tuple(np.asarray(shape_gt)),
        use_object_residual_update=False,  # loosely coupled in lite mode
    )
    ov = ObjectVio(ocfg, max_obs=sim.max_obs, dtype=jnp.float64)

    st = FilterState.create(fcfg, jnp.float64)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    d = np.asarray(fcfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c, t_c_b=t_c_b,
                    P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
    ov.set_filter_state(st)

    M_det = 2
    for k in range(n_frames):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        boxes = np.zeros((M_det, 4))
        classes = np.zeros(M_det, np.int32)
        kps = np.zeros((M_det, K_kps, 2))
        kmask = np.zeros((M_det, K_kps), bool)  # bbox-only: no keypoints ever
        if detectable[k]:
            boxes[0] = zb_all[k]
            valid = np.asarray([True, False])
        else:
            valid = np.asarray([False, False])
        ov.step(fr, boxes, classes, kps, kmask, valid)

    assert len(ov.object_map) >= 1, "no object finalized in lite mode"
    obj = list(ov.object_map.values())[0]
    # bbox-only: position is the observable part; require it close to GT
    dt = float(np.linalg.norm(obj["wTo"][:3, 3] - np.asarray(wTo_gt[:3, 3])))
    assert dt < 0.8, dt
    # no object EKF update in loosely-coupled mode
    assert not obj.get("ekf_update_applied", False)
