"""ZUPT tests: detection on static vs moving synthetic worlds and the vpq
pseudo-measurement update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.eval.trajectory import ate
from orcvio_tpu.filter.pipeline import build_chi2_table, run_sequence
from orcvio_tpu.filter.state import FilterState
from orcvio_tpu.filter.zupt import check_zupt_feat, check_zupt_imu, zupt_update
from orcvio_tpu.math import quat, so3

RNG = np.random.default_rng(21)


def static_state(cfg, n_feat=30, jitter=1e-4):
    from orcvio_tpu.filter.augment import state_augmentation
    from orcvio_tpu.filter import features as feat

    st = FilterState.create(cfg, jnp.float64)
    base = jnp.asarray(RNG.normal(size=(n_feat, 2)) * 0.3)
    for i in range(3):
        st = st.replace(t=jnp.asarray(float(i)))
        st = state_augmentation(cfg, st)
        uv = base + jnp.asarray(RNG.normal(size=(n_feat, 2)) * jitter)
        table, _ = feat.add_observations(
            st.features, jnp.asarray(i), jnp.arange(n_feat, dtype=jnp.int32), uv, uv * 0,
            jnp.ones(n_feat, bool),
        )
        st = st.replace(features=table)
    return st


class TestZuptChecks:
    def test_feat_static_fires(self):
        cfg = FilterConfig(sw_size=6, max_features=40, zupt_max_feature_dis=5e-3)
        st = static_state(cfg, jitter=1e-5)
        assert bool(check_zupt_feat(cfg, st))

    def test_feat_moving_rejects(self):
        cfg = FilterConfig(sw_size=6, max_features=40, zupt_max_feature_dis=5e-3)
        from orcvio_tpu.filter.augment import state_augmentation
        from orcvio_tpu.filter import features as feat

        st = FilterState.create(cfg, jnp.float64)
        base = jnp.asarray(RNG.normal(size=(30, 2)) * 0.3)
        for i in range(3):
            st = st.replace(t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
            uv = base + 0.05 * i  # large motion
            table, _ = feat.add_observations(
                st.features, jnp.asarray(i), jnp.arange(30, dtype=jnp.int32), uv, uv * 0,
                jnp.ones(30, bool),
            )
            st = st.replace(features=table)
        assert not bool(check_zupt_feat(cfg, st))

    def test_imu_static_fires_moving_rejects(self):
        cfg = FilterConfig(sw_size=6, max_features=40)
        st = FilterState.create(cfg, jnp.float64)
        chi2 = build_chi2_table(cfg, jnp.float64)
        S = 12
        t = jnp.linspace(0.005, 0.06, S)
        mask = jnp.ones(S, bool)
        g_static = jnp.asarray(RNG.normal(size=(S, 3)) * 1e-4)
        a_static = jnp.asarray([0.0, 0, 9.81]) + jnp.asarray(RNG.normal(size=(S, 3)) * 1e-3)
        assert bool(check_zupt_imu(cfg, st, t, g_static, a_static, mask, chi2))
        a_moving = a_static + jnp.asarray([1.5, 0, 0])
        assert not bool(check_zupt_imu(cfg, st, t, g_static, a_moving, mask, chi2))
        # high velocity blocks zupt even with static imu
        st_fast = st.replace(imu=st.imu.replace(v=jnp.asarray([1.0, 0, 0])))
        assert not bool(check_zupt_imu(cfg, st_fast, t, g_static, a_static, mask, chi2))


class TestZuptUpdate:
    def test_pulls_velocity_to_zero(self):
        cfg = FilterConfig(sw_size=6, max_features=8)
        st = static_state(cfg)
        # pretend the estimate drifted: nonzero velocity + clone offset
        st = st.replace(
            imu=st.imu.replace(v=jnp.asarray([0.05, -0.02, 0.01])),
            P=jnp.eye(cfg.state_dim, dtype=jnp.float64) * 1e-1,
        )
        st2 = zupt_update(cfg, st)
        assert float(jnp.linalg.norm(st2.imu.v)) < 0.5 * float(jnp.linalg.norm(st.imu.v))
        assert bool(jnp.all(jnp.isfinite(st2.P)))

    def test_end_to_end_static_start_with_zupt(self):
        """Filter with ZUPT enabled survives a static period without drift."""
        sim = SimConfig(n_frames=50, n_landmarks=200, max_obs=40, uv_noise=0.0005, seed=13,
                        static_time=10.0)  # fully static sequence
        cfg = FilterConfig(sw_size=8, max_features=60, max_track_len=4, imu_slab=sim.imu_slab,
                           observation_noise=0.004, tri_translation_threshold=-1.0,
                           if_zupt=True, zupt_max_feature_dis=0.01)
        R_b2c = jnp.asarray([[0.0, -1, 0], [0, 0, -1], [1.0, 0, 0]])
        data = generate(sim, R_b2c=R_b2c)
        st = FilterState.create(cfg, jnp.float64)
        R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
        imu = st.imu.replace(R=R0, p=p0)
        d = np.asarray(cfg.initial_cov_diag())
        d[:15] = 1e-6
        st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c,
                        P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_sequence(cfg, st, data.frames, chi2)
        err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
        assert np.isfinite(err).all()
        assert err[-1] < 0.05, err[-1]
