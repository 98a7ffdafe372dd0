"""Online calibration tests: the extrinsic (estimate_extrin) error-state
columns actually correct an injected camera-IMU extrinsic error."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.filter.pipeline import build_chi2_table, run_sequence
from orcvio_tpu.filter.state import FilterState
from orcvio_tpu.math import so3


@pytest.mark.slow
def test_extrinsic_estimation_converges():
    sim = SimConfig(n_frames=250, n_landmarks=300, max_obs=50, uv_noise=0.001, seed=8, omega=1.2)
    cfg = FilterConfig(
        sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
        observation_noise=0.003, tri_translation_threshold=-1.0,
        estimate_extrinsic=True,
        init_cov_extrin_rot=1e-3, init_cov_extrin_trans=1e-3,
    )
    R_b2c_true = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    t_c_b_true = jnp.asarray([0.05, 0.02, 0.0])
    data = generate(sim, R_b2c=R_b2c_true, t_c_b=t_c_b_true)

    # start the filter with a WRONG extrinsic guess
    dR_err = so3.exp(jnp.asarray([0.015, -0.02, 0.01]))
    R_b2c_guess = dR_err @ R_b2c_true
    t_c_b_guess = t_c_b_true + jnp.asarray([0.02, -0.015, 0.01])

    st = FilterState.create(cfg, jnp.float64)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    d = np.asarray(cfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu,
                    R_b2c=R_b2c_guess, t_c_b=t_c_b_guess,
                    P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
    chi2 = build_chi2_table(cfg, jnp.float64)
    final, outs = run_sequence(cfg, st, data.frames, chi2)

    rot_err0 = float(jnp.linalg.norm(so3.log(R_b2c_guess @ R_b2c_true.T)))
    rot_err1 = float(jnp.linalg.norm(so3.log(final.R_b2c @ R_b2c_true.T)))
    t_err0 = float(jnp.linalg.norm(t_c_b_guess - t_c_b_true))
    t_err1 = float(jnp.linalg.norm(final.t_c_b - t_c_b_true))
    # rotation extrinsic is strongly observable and must converge hard
    assert rot_err1 < 0.25 * rot_err0, (rot_err0, rot_err1)
    # translation extrinsic is weakly observable at a 5 cm lever arm on this
    # excitation level: require improvement-or-hold, not convergence
    assert t_err1 < 1.05 * t_err0, (t_err0, t_err1)
    # and the trajectory stays sane despite the initial miscalibration
    err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
    assert float(np.sqrt((err**2).mean())) < 0.3


class TestImuIntrinsics:
    def test_intrinsics_vec_roundtrip(self):
        from orcvio_tpu.filter.state import apply_imu_intrinsics_delta, imu_intrinsics_to_vec

        rng = np.random.default_rng(2)
        Tg = jnp.eye(3) ; As = jnp.zeros((3, 3)); Ma = jnp.eye(3)
        d = jnp.asarray(rng.normal(size=24) * 0.01)
        Tg2, As2, Ma2 = apply_imu_intrinsics_delta(Tg, As, Ma, d)
        v2 = imu_intrinsics_to_vec(Tg2, As2, Ma2)
        v0 = imu_intrinsics_to_vec(Tg, As, Ma)
        assert np.allclose(np.asarray(v2 - v0), np.asarray(d), atol=1e-12)
        # Ma upper triangle untouched
        assert float(Ma2[0, 1]) == 0.0 and float(Ma2[0, 2]) == 0.0 and float(Ma2[1, 2]) == 0.0

    @pytest.mark.parametrize("use_larvio", [False, True])
    def test_slab_sensitivity_matches_autodiff(self, use_larvio):
        """S_tot @ d predicts the [theta v p] change of the whole-slab
        propagation under an intrinsic perturbation d."""
        from orcvio_tpu.dataio.synthetic import SimConfig, generate
        from orcvio_tpu.filter.propagation import imu_batch_transition
        from orcvio_tpu.filter.state import FilterState, apply_imu_intrinsics_delta

        sim = SimConfig(n_frames=3, n_landmarks=10, max_obs=5, imu_slab=12, seed=1)
        cfg = FilterConfig(sw_size=4, max_features=8, imu_slab=12, calib_imu=True,
                           use_larvio=use_larvio)
        data = generate(sim)
        fr = jax.tree.map(lambda x: x[1], data.frames)

        st = FilterState.create(cfg, jnp.float64)
        st = st.replace(imu=st.imu.replace(R=so3.exp(jnp.asarray([0.1, -0.2, 0.3])),
                                           v=jnp.asarray([0.3, 0.1, -0.2])),
                        initialized=jnp.ones((), bool))

        st2, Phi, Q, S, _, _ = imu_batch_transition(
            cfg, st, fr.imu_t, fr.imu_gyro, fr.imu_acc, fr.imu_mask)
        assert S.shape == (22, 24)

        rng = np.random.default_rng(5)
        d = jnp.asarray(rng.normal(size=24) * 1e-5)
        Tg2, As2, Ma2 = apply_imu_intrinsics_delta(st.Tg, st.As, st.Ma, d)
        stp = st.replace(Tg=Tg2, As=As2, Ma=Ma2)
        st2p, *_ = imu_batch_transition(cfg, stp, fr.imu_t, fr.imu_gyro, fr.imu_acc, fr.imu_mask)

        M = np.asarray(st2p.imu.R @ st2.imu.R.T)
        dth = np.asarray([M[2, 1] - M[1, 2], M[0, 2] - M[2, 0], M[1, 0] - M[0, 1]]) / 2
        actual = np.concatenate([dth, np.asarray(st2p.imu.v - st2.imu.v),
                                 np.asarray(st2p.imu.p - st2.imu.p)])
        pred = np.asarray(S[:9] @ d)
        # per-component: the tiny p sensitivities inherit the per-step Phi
        # truncation order, so allow a few percent there; overall the
        # prediction must match to <0.5%
        assert np.allclose(actual, pred, atol=1e-12, rtol=0.1), (actual, pred)
        assert np.linalg.norm(actual - pred) < 5e-3 * np.linalg.norm(actual)

    @pytest.mark.slow
    def test_gyro_scale_estimation_converges(self):
        """Filter started with a wrong Tg diagonal (gyro scale error) pulls it
        back toward identity (the truth used to generate the data)."""
        from orcvio_tpu.filter.pipeline import build_chi2_table, run_sequence

        sim = SimConfig(n_frames=500, n_landmarks=300, max_obs=50, uv_noise=0.001,
                        seed=11, omega=1.2)
        cfg = FilterConfig(
            sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
            observation_noise=0.003, tri_translation_threshold=-1.0,
            calib_imu=True, init_cov_imu_intrinsic=1e-4,
        )
        R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
        t_c_b = jnp.asarray([0.05, 0.02, 0.0])
        data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)

        st = FilterState.create(cfg, jnp.float64)
        R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
        v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
        imu = st.imu.replace(R=R0, p=p0, v=v0)
        d = np.asarray(cfg.initial_cov_diag())
        d[:15] = 1e-6
        Tg_wrong = jnp.diag(jnp.asarray([1.02, 0.985, 1.015]))
        st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu,
                        R_b2c=R_b2c, t_c_b=t_c_b, Tg=Tg_wrong,
                        P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_sequence(cfg, st, data.frames, chi2)

        # x/y gyro scales are strongly excited on this trajectory and must
        # recover hard; the z scale is weakly excited (its marginal sd stays
        # at the prior) so only require overall improvement
        assert abs(float(final.Tg[0, 0]) - 1.0) < 0.4 * 0.02, np.asarray(final.Tg)
        assert abs(float(final.Tg[1, 1]) - 1.0) < 0.6 * 0.015, np.asarray(final.Tg)
        err0 = float(jnp.linalg.norm(Tg_wrong - jnp.eye(3)))
        err1 = float(jnp.linalg.norm(final.Tg - jnp.eye(3)))
        assert err1 < 0.75 * err0, (err0, err1)
        # trajectory stays sane despite the miscalibration
        err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
        assert float(np.sqrt((err**2).mean())) < 0.3


def test_calib_imu_with_hybrid_and_schmidt_layout():
    """calib_imu composes with EKF features + Schmidt: the intrinsic block
    sits between features and nuisance (config.intrinsic_base) and a short
    run stays finite."""
    from orcvio_tpu.filter.hybrid import nui_base

    sim = SimConfig(n_frames=40, n_landmarks=200, max_obs=40, uv_noise=0.002, seed=6)
    cfg = FilterConfig(
        sw_size=8, max_features=60, max_track_len=5, imu_slab=sim.imu_slab,
        observation_noise=0.004, tri_translation_threshold=-1.0,
        ekf_feature_cap=8, use_schmidt=True, nuisance_cap=4, calib_imu=True,
    )
    assert cfg.state_dim == 22 + 6 * 8 + 3 * 8 + 24 + 6 * 4
    assert cfg.intrinsic_base == 22 + 6 * 8 + 3 * 8
    assert nui_base(cfg) == cfg.intrinsic_base + 24
    R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    t_c_b = jnp.asarray([0.05, 0.02, 0.0])
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
    st = FilterState.create(cfg, jnp.float64)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    d = np.asarray(cfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c, t_c_b=t_c_b,
                    P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
    chi2 = build_chi2_table(cfg, jnp.float64)
    final, outs = run_sequence(cfg, st, data.frames, chi2)
    assert bool(jnp.all(jnp.isfinite(final.P)))
    err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
    assert float(np.sqrt((err**2).mean())) < 0.3


def test_prediction_only_dead_reckons():
    """prediction_only_flag: no features ingested, zero updates, pure DR."""
    sim = SimConfig(n_frames=30, n_landmarks=100, max_obs=20, uv_noise=0.002, seed=2)
    cfg = FilterConfig(sw_size=6, max_features=40, max_track_len=4, imu_slab=sim.imu_slab,
                       tri_translation_threshold=-1.0, prediction_only=True)
    data = generate(sim)
    st = FilterState.create(cfg, jnp.float64)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, initialized=jnp.ones((), bool))
    chi2 = build_chi2_table(cfg, jnp.float64)
    final, outs = run_sequence(cfg, st, data.frames, chi2)
    assert int(np.asarray(outs.n_update_features).sum()) == 0
    assert int(jnp.sum(final.features.fid >= 0)) == 0
    assert bool(jnp.all(jnp.isfinite(outs.p)))


def test_load_initial_state_yaml(tmp_path):
    from orcvio_tpu.config.yaml_io import load_initial_state

    y = tmp_path / "cfg.yaml"
    y.write_text(
        "%YAML:1.0\n---\n"
        "initial_use_gt: 1\n"
        "initial_state_time: 12.5\n"
        "initial_bg: !!opencv-matrix\n  rows: 3\n  cols: 1\n  dt: d\n  data: [0.01, -0.02, 0.003]\n"
        "initial_ba: !!opencv-matrix\n  rows: 3\n  cols: 1\n  dt: d\n  data: [0.1, 0.0, -0.05]\n"
        "initial_pos: !!opencv-matrix\n  rows: 3\n  cols: 1\n  dt: d\n  data: [1.0, 2.0, 3.0]\n"
        "initial_vel: !!opencv-matrix\n  rows: 3\n  cols: 1\n  dt: d\n  data: [0.5, 0.0, 0.0]\n"
        "initial_quat: !!opencv-matrix\n  rows: 4\n  cols: 1\n  dt: d\n  data: [0.0, 0.0, 0.0, 1.0]\n"
    )
    s = load_initial_state(str(y))
    assert s is not None
    assert s["t"] == 12.5
    assert np.allclose(s["p"], [1.0, 2.0, 3.0])
    assert np.allclose(s["R"], np.eye(3))
    assert np.allclose(s["bg"], [0.01, -0.02, 0.003])
    # file without the flag -> None
    y2 = tmp_path / "cfg2.yaml"
    y2.write_text("%YAML:1.0\n---\nsw_size: 10\n")
    assert load_initial_state(str(y2)) is None
