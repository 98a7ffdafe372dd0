"""Dynamic initializer tests: preintegration vs direct integration, essential
decomposition, window SfM, and the full visual-inertial alignment on a
moving-from-start synthetic sequence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, imu_measurements, trajectory_pose
from orcvio_tpu.init.dynamic import (
    decompose_essential,
    dynamic_initialize,
    solve_gyro_bias,
    triangulate_dlt,
    window_sfm,
)
from orcvio_tpu.init.preintegration import preintegrate, preintegrate_sequence
from orcvio_tpu.math import se3, so3

RNG = np.random.default_rng(31)


def tracks_from_frames(frames, K, N_cap=80):
    """Stack per-frame (fid, uv) measurements into (N, K, 2) tracks."""
    fids_all = np.asarray(frames.fids[:K])
    uvs_all = np.asarray(frames.uvs[:K])
    mask_all = np.asarray(frames.meas_mask[:K])
    ids = sorted(set(fids_all[mask_all].tolist()))[:N_cap]
    id_to_row = {f: i for i, f in enumerate(ids)}
    N = len(ids)
    uv = np.zeros((N, K, 2))
    m = np.zeros((N, K), bool)
    for k in range(K):
        for j in range(fids_all.shape[1]):
            f = fids_all[k, j]
            if mask_all[k, j] and f in id_to_row:
                uv[id_to_row[f], k] = uvs_all[k, j]
                m[id_to_row[f], k] = True
    return jnp.asarray(uv), jnp.asarray(m)


class TestPreintegration:
    def test_matches_direct_integration(self):
        sim = SimConfig()
        S = 21
        ts = jnp.linspace(1.0, 1.1, S)
        g_fn = jax.vmap(lambda t: imu_measurements(sim, t))
        gyro, acc = g_fn(ts)
        pre = preintegrate(ts, gyro, acc, jnp.ones(S, bool), jnp.zeros(3), jnp.zeros(3))
        R0, p0 = trajectory_pose(sim, ts[0])
        R1, p1 = trajectory_pose(sim, ts[-1])
        v_fn = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])
        v0 = v_fn(ts[0])
        v1 = v_fn(ts[-1])
        dt = float(ts[-1] - ts[0])
        g_w = jnp.asarray([0.0, 0, -sim.gravity])
        # ground-truth preintegration identities
        dR_gt = R0.T @ R1
        dv_gt = R0.T @ (v1 - v0 - g_w * dt)
        dp_gt = R0.T @ (p1 - p0 - v0 * dt - 0.5 * g_w * dt * dt)
        assert np.allclose(np.asarray(pre.dR), np.asarray(dR_gt), atol=2e-5)
        assert np.allclose(np.asarray(pre.dv), np.asarray(dv_gt), atol=2e-4)
        assert np.allclose(np.asarray(pre.dp), np.asarray(dp_gt), atol=2e-5)

    def test_bias_jacobian(self):
        sim = SimConfig()
        S = 11
        ts = jnp.linspace(1.0, 1.05, S)
        gyro, acc = jax.vmap(lambda t: imu_measurements(sim, t))(ts)
        mask = jnp.ones(S, bool)

        def dR_of(bg):
            return preintegrate(ts, gyro, acc, mask, bg, jnp.zeros(3)).dR

        pre = preintegrate(ts, gyro, acc, mask, jnp.zeros(3), jnp.zeros(3))
        J_num = jax.jacobian(lambda bg: so3.log(pre.dR.T @ dR_of(bg)))(jnp.zeros(3))
        assert np.allclose(np.asarray(pre.J_q_bg), np.asarray(J_num), atol=5e-4), (
            np.abs(np.asarray(pre.J_q_bg) - np.asarray(J_num)).max()
        )


class TestTwoView:
    def test_decompose_essential(self):
        R = np.asarray(so3.exp(jnp.asarray([0.03, -0.05, 0.02])))
        t = np.array([0.3, 0.05, 0.1])
        t = t / np.linalg.norm(t)
        pts = RNG.uniform([-1.5, -1.5, 4], [1.5, 1.5, 8], size=(60, 3))
        p1 = pts[:, :2] / pts[:, 2:3]
        pc2 = (R @ pts.T).T + t
        p2 = pc2[:, :2] / pc2[:, 2:3]
        E = jnp.asarray(np.cross(t, R.T, axisa=0, axisb=0)) if False else jnp.asarray(
            np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]) @ R
        )
        R_est, t_est, n = decompose_essential(E, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(60, bool))
        assert int(n) > 55
        assert np.allclose(np.asarray(R_est), R, atol=1e-5)
        assert np.allclose(np.abs(np.dot(np.asarray(t_est), t)), 1.0, atol=1e-5)

    def test_triangulate_dlt(self):
        K = 4
        poses = [se3.make_pose(so3.exp(jnp.asarray([0, 0.05 * k, 0])), jnp.asarray([0.5 * k, 0, 0])) for k in range(K)]
        wTc = jnp.stack(poses)
        cTw = se3.inverse_pose(wTc)
        pts = jnp.asarray(RNG.uniform([-1, -1, 4], [1, 1, 7], size=(20, 3)))
        pc = jnp.einsum("kij,nj->nki", cTw[:, :3, :3], pts) + cTw[None, :, :3, 3]
        uv = pc[..., :2] / pc[..., 2:3]
        p_est, ok = triangulate_dlt(cTw, uv, jnp.ones((20, K), bool))
        assert bool(ok.all())
        assert np.allclose(np.asarray(p_est), np.asarray(pts), atol=1e-5)


class TestDynamicInit:
    def make_window(self, K=10, frame_hz=10.0):
        sim = SimConfig(
            n_frames=K, frame_hz=frame_hz, imu_slab=24, n_landmarks=250, max_obs=60,
            uv_noise=5e-4, gyro_noise=1e-4, acc_noise=1e-3, seed=7, radius=2.0, omega=0.8,
        )
        R_b2c = jnp.asarray([[0.0, -1, 0], [0, 0, -1], [1.0, 0, 0]])
        t_c_b = jnp.asarray([0.04, 0.01, 0.02])
        data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
        uv, m = tracks_from_frames(data.frames, K)
        return sim, data, uv, m, R_b2c, t_c_b

    def test_window_sfm_recovers_motion_shape(self):
        sim, data, uv, m, R_b2c, t_c_b = self.make_window()
        sfm, p_w, ok3d = window_sfm(uv, m, jax.random.PRNGKey(0))
        assert bool(sfm.ok)
        # compare camera direction ratios (up to scale + gauge): relative
        # translations between consecutive cameras should be proportional to GT
        gt_R = np.asarray(data.gt_R)
        gt_p = np.asarray(data.gt_p)
        Rb2c = np.asarray(R_b2c)
        gt_cam_p = gt_p + np.einsum("kij,j->ki", gt_R, np.asarray(t_c_b))
        d_gt = np.diff(gt_cam_p, axis=0)
        d_est = np.diff(np.asarray(sfm.p_c0_ck), axis=0)
        # align est to gt with one global similarity (c0 gauge)
        from orcvio_tpu.eval.trajectory import umeyama

        s, R, t = umeyama(np.asarray(sfm.p_c0_ck), gt_cam_p, with_scale=True)
        err = np.linalg.norm((s * (R @ np.asarray(sfm.p_c0_ck).T).T + t) - gt_cam_p, axis=1)
        assert err.max() < 0.05, err

    def test_full_dynamic_initialize(self):
        sim, data, uv, m, R_b2c, t_c_b = self.make_window()
        cfg = FilterConfig()
        res = dynamic_initialize(
            cfg, uv, m,
            data.frames.imu_t, data.frames.imu_gyro, data.frames.imu_acc, data.frames.imu_mask,
            R_b2c, t_c_b, jax.random.PRNGKey(1),
        )
        assert bool(res.ok)
        K = uv.shape[1]
        t_last = float(data.frames.t[K - 1])
        R_gt, _ = trajectory_pose(sim, jnp.asarray(t_last))
        v_gt = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(t_last))
        # gravity alignment: estimated world z must match true world z:
        # R_est^T z == R_gt^T z (body-frame gravity direction)
        z_est = np.asarray(res.imu.R).T @ [0, 0, 1]
        z_gt = np.asarray(R_gt).T @ [0, 0, 1]
        ang = np.degrees(np.arccos(np.clip(np.dot(z_est, z_gt), -1, 1)))
        assert ang < 2.0, ang
        # speed magnitude within 15%
        sp_est = float(jnp.linalg.norm(res.imu.v))
        sp_gt = float(jnp.linalg.norm(v_gt))
        assert abs(sp_est - sp_gt) < 0.15 * sp_gt + 0.05, (sp_est, sp_gt)
        # gyro bias ~ 0 (noiseless-bias sim)
        assert float(jnp.linalg.norm(res.imu.bg)) < 5e-3
