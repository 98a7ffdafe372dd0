"""Full-stack integration: rendered images -> KLT/ORB/RANSAC tracker ->
MSCKF filter, against analytic ground truth. The closest equivalent of the
reference's EuRoC end-to-end evaluation, fully self-contained."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import (
    SimConfig,
    imu_measurements,
    render_plane_view,
    smooth_texture,
    trajectory_pose,
)
from orcvio_tpu.eval.trajectory import ate
from orcvio_tpu.filter.state import FilterState
from orcvio_tpu.frontend.tracker import TrackerConfig
from orcvio_tpu.math import quat
from orcvio_tpu.run_vio import run_image_sequence

# camera looking straight down (body z up): cam x = body x, cam y = -body y,
# cam z = -body z
R_B2C_DOWN = np.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])


@pytest.mark.slow
def test_rendered_vio_tracks_truth():
    sim = SimConfig(n_frames=60, frame_hz=20.0, imu_slab=12, imu_hz=200.0,
                    height=4.0, radius=2.0, omega=0.5, seed=9,
                    gyro_noise=0.002, acc_noise=0.04)
    H, W = 240, 320
    K = (200.0, 200.0, W / 2, H / 2)
    tex = smooth_texture(1400, 1400, seed=4)
    tex_scale = 0.012  # ~17 m square world

    dt_f = 1.0 / sim.frame_hz
    dt_i = 1.0 / sim.imu_hz
    frame_ts = (np.arange(sim.n_frames) + 1) * dt_f

    # IMU slabs (exact, light noise)
    rng = np.random.default_rng(0)
    imu_t = np.stack([t - dt_f + dt_i * (1 + np.arange(sim.imu_slab)) for t in frame_ts])
    imu_mask = imu_t <= frame_ts[:, None] + 1e-9
    gfun = jax.jit(jax.vmap(lambda t: imu_measurements(sim, t)))
    gyro, acc = gfun(jnp.asarray(imu_t.reshape(-1)))
    gyro = np.asarray(gyro).reshape(imu_t.shape + (3,)) + rng.normal(size=imu_t.shape + (3,)) * sim.gyro_noise
    acc = np.asarray(acc).reshape(imu_t.shape + (3,)) + rng.normal(size=imu_t.shape + (3,)) * sim.acc_noise

    pose_fn = jax.jit(jax.vmap(lambda t: trajectory_pose(sim, t)))
    gt_R, gt_p = pose_fn(jnp.asarray(frame_ts))
    gt_R, gt_p = np.asarray(gt_R), np.asarray(gt_p)

    render_j = jax.jit(
        lambda Rc2w, tcw: render_plane_view(tex, tex_scale, Rc2w, tcw, K, H, W)
    )
    t_c_b = np.asarray([0.03, 0.01, 0.0])
    images = []
    for k in range(sim.n_frames):
        R_c2w = jnp.asarray(gt_R[k] @ R_B2C_DOWN.T)
        t_cw = jnp.asarray(gt_p[k] + gt_R[k] @ t_c_b)
        images.append(np.asarray(render_j(R_c2w, t_cw)))

    cfg = FilterConfig(sw_size=10, max_features=80, max_track_len=6,
                       imu_slab=sim.imu_slab, observation_noise=0.005,
                       tri_translation_threshold=-1.0,
                       gyro_noise=0.004, acc_noise=0.08)
    tc = TrackerConfig(height=H, width=W, pyramid_levels=3, capacity=80,
                       grid_rows=5, grid_cols=6, per_cell=3, min_distance=12.0,
                       K=K, dist_model="none", dist_coeffs=(), equalize=False)

    # GT-initialized filter (initial_use_gt mode, orcvio.cpp:123-146)
    st = FilterState.create(cfg, jnp.float32)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    d = np.asarray(cfg.initial_cov_diag())
    d[:15] = 1e-6
    imu = st.imu.replace(R=R0.astype(jnp.float32), p=p0.astype(jnp.float32), v=v0.astype(jnp.float32))
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu,
                    P=jnp.asarray(np.diag(d), jnp.float32),
                    initialized=jnp.ones((), bool))

    res = run_image_sequence(
        cfg, tc, lambda k: images[k], frame_ts, imu_t, gyro, acc, imu_mask,
        R_B2C_DOWN, t_c_b, init_filter_state=st,
    )
    assert res["n_updates"].sum() > 10, "no MSCKF updates fired"
    q_est = np.stack([np.asarray(quat.from_rotation(jnp.asarray(R))) for R in res["R"]])
    q_gt = np.stack([np.asarray(quat.from_rotation(jnp.asarray(R))) for R in gt_R])
    m = ate(res["t"], res["p"], q_est, frame_ts, gt_p, q_gt, alignment="posyaw")
    # 3 s rendered sequence: sub-decimeter position, few-degree attitude
    assert m["rmse_trans"] < 0.15, m
    assert m["rmse_rot_deg"] < 3.0, m
