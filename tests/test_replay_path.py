"""Tests for the replay path: config ingestion, EuRoC reader, static init,
full VIO (init -> filter) on a static-start synthetic sequence, and the
trajectory evaluation suite."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.config.yaml_io import load_reference_yaml
from orcvio_tpu.dataio.euroc import bin_imu_per_frame, load_euroc, read_tum, write_tum
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.eval.trajectory import ate, relative_errors, umeyama
from orcvio_tpu.filter.pipeline import build_chi2_table
from orcvio_tpu.init.static_init import StaticInitState, initial_imu_state, static_init_step
from orcvio_tpu.math import so3
from orcvio_tpu.vio import VioState, run_vio

pytestmark = pytest.mark.slow  # >60 s e2e module; deselect with -m 'not slow'

REF_CFG = "/root/reference/config/euroc.yaml"


class TestYamlConfig:
    @pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference configs not mounted")
    def test_load_reference_euroc(self):
        cfg, cam, fe = load_reference_yaml(REF_CFG)
        assert cfg.sw_size == 20
        assert cfg.max_track_len == 6
        assert cam.fx == pytest.approx(458.654)
        assert cam.distortion_model == "radtan"
        assert fe.max_features_num == 200
        # extrinsics: T_cam_imu inverted correctly (R orthonormal)
        R = np.asarray(cam.R_b2c)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert cfg.observation_noise > 0


class TestEurocReader:
    def make_fake_euroc(self, tmp_path):
        mav = tmp_path / "mav0"
        (mav / "imu0").mkdir(parents=True)
        (mav / "cam0" / "data").mkdir(parents=True)
        (mav / "state_groundtruth_estimate0").mkdir(parents=True)
        t_ns = (1e9 * (1.0 + np.arange(100) * 0.005)).astype(np.int64)
        imu = np.column_stack([t_ns, np.tile([0.01, 0.02, 0.03, 0.1, 0.2, 9.8], (100, 1))])
        np.savetxt(mav / "imu0" / "data.csv", imu, delimiter=",", header="ts,gx,gy,gz,ax,ay,az")
        cam_ns = (1e9 * (1.0 + np.arange(10) * 0.05)).astype(np.int64)
        with open(mav / "cam0" / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for ts in cam_ns:
                f.write(f"{ts},{ts}.png\n")
        gt = np.column_stack([t_ns[:50], np.zeros((50, 3)), np.tile([1.0, 0, 0, 0], (50, 1)), np.zeros((50, 3))])
        np.savetxt(mav / "state_groundtruth_estimate0" / "data.csv", gt, delimiter=",", header="hdr")
        return str(tmp_path)

    def test_load_and_bin(self, tmp_path):
        root = self.make_fake_euroc(tmp_path)
        seq = load_euroc(root)
        assert len(seq.cam_t) == 10
        assert len(seq.imu_t) == 100
        assert seq.gt_t is not None and len(seq.gt_t) == 50
        imu_t, gyro, acc, mask = bin_imu_per_frame(seq, slab=16)
        assert imu_t.shape == (10, 16)
        # every IMU sample <= last bound assigned exactly once
        n_assigned = int(mask.sum())
        n_expected = int((seq.imu_t <= seq.cam_t[-1] + 0.5 / 200).sum())
        assert n_assigned == n_expected
        # within each frame, samples in (t_{k-1}, t_k]
        for k in range(1, 10):
            ts = imu_t[k][mask[k]]
            assert (ts > seq.cam_t[k - 1]).all() and (ts <= seq.cam_t[k] + 0.0026).all()

    def test_tum_roundtrip(self, tmp_path):
        p = np.random.default_rng(0).normal(size=(5, 3))
        q = np.tile([0, 0, 0, 1.0], (5, 1))
        path = str(tmp_path / "traj.txt")
        write_tum(path, np.arange(5.0), p, q)
        t2, p2, q2 = read_tum(path)
        assert np.allclose(p2, p, atol=1e-8)

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/eval_results/euroc_mav/MH_01_easy.txt"),
        reason="reference eval_results not mounted",
    )
    def test_read_reference_trajectory(self):
        t, p, q = read_tum("/root/reference/eval_results/euroc_mav/MH_01_easy.txt")
        assert len(t) > 30000
        assert np.abs(np.linalg.norm(q, axis=1) - 1).max() < 1e-3


class TestStaticInit:
    def test_static_then_move(self):
        cfg = FilterConfig(static_image_num=5, static_min_matches=10, zupt_max_feature_dis=2e-3)
        M = 40
        s = StaticInitState.create(M, jnp.float64)
        rng = np.random.default_rng(0)
        uv0 = jnp.asarray(rng.normal(size=(M, 2)) * 0.3)
        fids = jnp.arange(M, dtype=jnp.int32)
        mask = jnp.ones(M, bool)
        gyro_true = jnp.asarray([0.002, -0.001, 0.0005])
        # gravity tilted: imu measures specific force -g in body frame
        R_tilt = so3.exp(jnp.asarray([0.1, -0.05, 0.0]))
        acc_meas = R_tilt.T @ jnp.asarray([0.0, 0.0, 9.81])
        S = 10
        imu_gyro = jnp.tile(gyro_true, (S, 1))
        imu_acc = jnp.tile(acc_meas, (S, 1))
        imu_mask = jnp.ones(S, bool)
        for k in range(6):
            uv = uv0 + rng.normal(size=(M, 2)) * 1e-4  # sub-threshold jitter
            s = static_init_step(cfg, s, fids, jnp.asarray(uv), mask, imu_gyro, imu_acc, imu_mask)
        assert bool(s.done)
        imu0 = initial_imu_state(cfg, s, jnp.float64)
        assert np.allclose(np.asarray(imu0.bg), np.asarray(gyro_true), atol=1e-9)
        # R0 must map measured gravity direction to world +z
        g_aligned = np.asarray(imu0.R) @ np.asarray(acc_meas)
        assert np.allclose(g_aligned[:2], 0, atol=1e-6)
        assert g_aligned[2] > 9.7

    def test_motion_resets_counter(self):
        cfg = FilterConfig(static_image_num=5, static_min_matches=10)
        M = 40
        s = StaticInitState.create(M, jnp.float64)
        uv0 = jnp.zeros((M, 2))
        fids = jnp.arange(M, dtype=jnp.int32)
        mask = jnp.ones(M, bool)
        z3 = jnp.zeros((4, 3))
        im = jnp.ones(4, bool)
        s = static_init_step(cfg, s, fids, uv0, mask, z3, z3, im)
        s = static_init_step(cfg, s, fids, uv0, mask, z3, z3, im)
        assert int(s.counter) >= 1
        s = static_init_step(cfg, s, fids, uv0 + 0.1, mask, z3, z3, im)  # big motion
        assert int(s.counter) == 0
        assert not bool(s.done)


class TestFullVio:
    def test_init_then_track(self):
        sim = SimConfig(
            n_frames=140, n_landmarks=300, max_obs=50, uv_noise=0.001, seed=11,
            static_time=1.5, ramp_time=1.0,
        )
        cfg = FilterConfig(
            sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
            observation_noise=0.004, tri_translation_threshold=-1.0,
            static_image_num=10, static_min_matches=15,
            # sim uv noise is i.i.d. per frame (unlike KLT jitter), so the
            # static-motion threshold must sit above its frame-to-frame diff
            zupt_max_feature_dis=0.012,
        )
        R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        t_c_b = jnp.asarray([0.05, 0.02, 0.0])
        data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
        st = VioState.create(cfg, sim.max_obs, jnp.float64)
        st = st.replace(filter=st.filter.replace(R_b2c=R_b2c, t_c_b=t_c_b))
        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_vio(cfg, st, data.frames, chi2)
        assert bool(final.filter.initialized)
        # after init, the estimate is in a gravity-aligned frame with arbitrary
        # origin/yaw -> evaluate with posyaw alignment on the moving part
        moving = np.asarray(data.frames.t) > sim.static_time + 0.5
        from orcvio_tpu.math import quat

        q_est = np.asarray(jax.vmap(quat.from_rotation)(outs.R))
        q_gt = np.asarray(jax.vmap(quat.from_rotation)(data.gt_R))
        res = ate(
            np.asarray(outs.t)[moving], np.asarray(outs.p)[moving], q_est[moving],
            np.asarray(data.frames.t)[moving], np.asarray(data.gt_p)[moving], q_gt[moving],
            alignment="posyaw",
        )
        assert res["rmse_trans"] < 0.25, res
        assert int(np.asarray(outs.n_update_features).sum()) > 20


class TestEval:
    def test_ate_recovers_transform(self):
        rng = np.random.default_rng(1)
        t = np.arange(50.0)
        p = np.cumsum(rng.normal(size=(50, 3)), axis=0)
        from orcvio_tpu.math import so3 as _so3

        R = np.asarray(_so3.exp(jnp.asarray([0.3, -0.2, 1.0])))
        p_est = (R @ p.T).T + np.array([5.0, -2.0, 1.0])
        q = np.tile([0, 0, 0, 1.0], (50, 1))
        q_rot = np.tile(np.asarray(jnp.asarray([0, 0, 0, 1.0])), (50, 1))
        res = ate(t, p_est, q_rot, t, p, q, alignment="se3")
        assert res["rmse_trans"] < 1e-9
        # sim3 with scale
        res2 = ate(t, 2.0 * p_est, q_rot, t, p, q, alignment="sim3")
        assert res2["rmse_trans"] < 1e-9
        assert abs(res2["scale"] - 0.5) < 1e-9

    def test_umeyama_known(self):
        rng = np.random.default_rng(2)
        src = rng.normal(size=(30, 3))
        R = np.asarray(so3.exp(jnp.asarray([0.1, 0.2, 0.3])))
        dst = 1.7 * (R @ src.T).T + np.array([1, 2, 3.0])
        s, R2, t2 = umeyama(src, dst, with_scale=True)
        assert abs(s - 1.7) < 1e-9
        assert np.allclose(R2, R, atol=1e-9)

    def test_relative_errors(self):
        t = np.arange(100.0)
        p = np.column_stack([np.arange(100.0), np.zeros(100), np.zeros(100)])
        out = relative_errors(t, p + 0.01, t, p, distances=(8.0, 16.0))
        assert all(v < 1.0 for v in out.values())


class TestEurocWriter:
    def test_roundtrip_writer_loader(self, tmp_path):
        """write_euroc_dataset output parses with load_euroc; IMU at rest
        reads gravity+bias; GT quats match the written rotations."""
        from orcvio_tpu.dataio.euroc_writer import (
            CameraModel, WriterConfig, write_euroc_dataset, write_reference_config,
        )
        from orcvio_tpu.dataio.synthetic import SimConfig

        sim = SimConfig(n_frames=6, frame_hz=20.0, imu_hz=200.0, static_time=1.0,
                        height=4.0, radius=2.0, omega=0.5, seed=3,
                        gyro_noise=0.0, acc_noise=0.0)
        wc = WriterConfig(cam=CameraModel(width=64, height=48, fx=40.0, fy=40.0, cx=32.0, cy=24.0),
                          tex_size=256, image_noise=0.0)
        info = write_euroc_dataset(str(tmp_path), sim, wc)
        seq = load_euroc(str(tmp_path))
        assert len(seq.cam_t) == 6
        # timestamps survive the absolute epoch to float64 precision (~50 ns)
        assert abs((seq.cam_t[0] - 1.4e9) - 0.05) < 1e-6
        # at rest (t < static_time): gyro == bias, acc == R^T g + bias
        g0 = seq.gyro[0]
        assert np.allclose(g0, wc.gyro_bias, atol=1e-6)
        anorm = np.linalg.norm(seq.acc[0] - np.asarray(wc.acc_bias))
        assert abs(anorm - 9.81) < 1e-3
        # GT file: quaternion column order is w-first on disk, xyzw in loader
        assert seq.gt_q.shape == (6, 4)
        assert np.allclose(np.linalg.norm(seq.gt_q, axis=1), 1.0, atol=1e-6)
        # config in the reference schema parses with our reference-YAML reader
        cfg_path = str(tmp_path / "config.yaml")
        write_reference_config(cfg_path, sim, wc, output_dir=str(tmp_path) + "/")
        from orcvio_tpu.config.yaml_io import load_reference_yaml

        cfg, cam, fe = load_reference_yaml(cfg_path)
        assert cam.width == 64 and cam.height == 48
        assert np.allclose(cam.dist_coeffs, 0.0)
        # extrinsics: R_b2c is the down-looking camera
        from orcvio_tpu.dataio.euroc_writer import R_B2C_DOWN

        assert np.allclose(np.asarray(cam.R_b2c), R_B2C_DOWN, atol=1e-12)
        assert np.allclose(np.asarray(cam.t_c_b), wc.t_c_b, atol=1e-12)
