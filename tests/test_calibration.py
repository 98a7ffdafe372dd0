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
