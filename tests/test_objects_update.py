"""Object-residual EKF update contract tests — the equivalent of the
reference's test_state_update.cpp: verify row/column mapping, the
linearization r ~ H dx, and that the full update pulls perturbed window
states back toward truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.filter.augment import cam_poses, increment_state, state_augmentation
from orcvio_tpu.filter.pipeline import build_chi2_table
from orcvio_tpu.filter.state import LEG, FilterState
from orcvio_tpu.math import se3, so3
from orcvio_tpu.objects import residuals as RS
from orcvio_tpu.objects.lm import ObjectLMConfig, ObjectLMData, ObjectLMState, export_for_update
from orcvio_tpu.objects.update import build_object_H, match_timestamps, object_ekf_update

RNG = np.random.default_rng(5)


def make_world(n_clones=5, K=5, with_bbox=False):
    cfg = FilterConfig(sw_size=6, max_features=8)
    st = FilterState.create(cfg, jnp.float64)
    for i in range(n_clones):
        R = so3.exp(jnp.asarray([0.02 * i, -0.01 * i, 0.05 * i]))
        p = jnp.asarray([0.5 * i, 0.1 * i, 0.0])
        imu = st.imu.replace(R=R, p=p)
        st = st.replace(imu=imu, imu_fej_now=imu, t=jnp.asarray(float(i)))
        st = state_augmentation(cfg, st)
    wTo_gt = se3.make_pose(so3.exp(jnp.asarray([0.1, 0.2, 0.3])), jnp.asarray([1.0, 0.5, 6.0]))
    kps = jnp.asarray(RNG.normal(size=(K, 3)) * 0.5)
    shape = jnp.asarray([1.5, 0.8, 0.6])
    R_c2w, t_c_w = cam_poses(st)
    wTc = se3.make_pose(R_c2w, t_c_w)[:n_clones]
    cTw = se3.inverse_pose(wTc)
    zs = RS.feature_residual(wTo_gt, kps, cTw, jnp.zeros((n_clones, K, 2)), jnp.ones((n_clones, K), bool))
    zb_mask = jnp.ones(n_clones, bool) if with_bbox else jnp.zeros(n_clones, bool)
    zb = RS.bbox_residual(wTo_gt, shape, cTw, jnp.tile(jnp.asarray([0.0, 0, 0, 0]), (n_clones, 1)), zb_mask, False) * 0
    zb = jnp.tile(jnp.asarray([-0.3, -0.3, 0.3, 0.3]), (n_clones, 1))
    data = ObjectLMData(
        cTw=cTw, zs=zs, zs_mask=jnp.ones((n_clones, K), bool),
        zb=zb, zb_mask=zb_mask, frame_mask=jnp.ones(n_clones, bool),
        kps_mean=kps, shape_mean=shape,
    )
    st_obj = ObjectLMState(wTo=wTo_gt, shape=shape, kps=kps)
    return cfg, st, st_obj, data, wTc


class TestBuildObjectH:
    def test_timestamp_matching(self):
        cfg, st, st_obj, data, wTc = make_world()
        slot, ok = match_timestamps(jnp.asarray([0.0, 2.0, 7.0]), st.clones.t, st.clones.valid)
        assert int(slot[0]) == 0 and int(slot[1]) == 2
        assert not bool(ok[2]) and int(slot[2]) == -1

    @pytest.mark.parametrize("left", [True, False])
    def test_linearization(self, left):
        cfg, st, st_obj, data, wTc = make_world()
        cfg = FilterConfig(**{**cfg.__dict__, "use_left_perturbation": left})
        lmc = ObjectLMConfig(use_left_perturbation=left)
        dx = jnp.zeros(cfg.state_dim).at[LEG : LEG + 30].set(jnp.asarray(RNG.normal(size=30)) * 1e-4)
        st_pert = increment_state(cfg, st, dx)
        R2, t2 = cam_poses(st_pert)
        wTc_p = se3.make_pose(R2, t2)[:5]
        data_p = data._replace(cTw=se3.inverse_pose(wTc_p))
        exp = export_for_update(lmc, st_obj, data_p)
        Hx, Hf, r, mask, anym = build_object_H(cfg, st_pert, exp, wTc_p, jnp.arange(5.0))
        delta = -dx  # true-minus-estimate
        rel = float(jnp.linalg.norm(r - Hx @ delta) / jnp.linalg.norm(r))
        assert rel < 1e-3, rel

    @pytest.mark.parametrize("left", [True, False])
    def test_residual_transport_to_current_state(self, left):
        """The LM linearized at stale history poses; after the filter state
        moves on, the transported residual must equal the innovation at the
        CURRENT clone estimates to first order (r ~ Hx (true - estimate)).
        With transport off (literal reference semantics, orcvio.cpp:2017),
        the residual stays at its stale value (~0 here) and carries no
        information about the pose refinement."""
        cfg, st, st_obj, data, wTc = make_world()
        cfg = FilterConfig(**{**cfg.__dict__, "use_left_perturbation": left})
        lmc = ObjectLMConfig(use_left_perturbation=left)
        # LM ran at the history poses wTc where the measurements are exact:
        # its residual is ~0 there
        exp = export_for_update(lmc, st_obj, data)
        dx = jnp.zeros(cfg.state_dim).at[LEG : LEG + 30].set(
            jnp.asarray(RNG.normal(size=30)) * 1e-4)
        st_pert = increment_state(cfg, st, dx)
        Hx, Hf, r, mask, anym = build_object_H(
            cfg, st_pert, exp, wTc, jnp.arange(5.0))
        delta = -dx  # true-minus-estimate
        rel = float(jnp.linalg.norm(r - Hx @ delta) / jnp.linalg.norm(Hx @ delta))
        assert rel < 1e-3, rel
        # reference semantics: no transport -> stale (zero) residual
        cfg_ref = FilterConfig(**{**cfg.__dict__, "object_residual_transport": False})
        _, _, r_ref, _, _ = build_object_H(
            cfg_ref, st_pert, exp, wTc, jnp.arange(5.0))
        assert float(jnp.abs(r_ref).max()) < 1e-10

    def test_unmatched_frames_are_zero_rows(self):
        cfg, st, st_obj, data, wTc = make_world()
        lmc = ObjectLMConfig()
        exp = export_for_update(lmc, st_obj, data)
        # object timestamps 10.. none match the window
        Hx, Hf, r, mask, anym = build_object_H(cfg, st, exp, wTc, 10.0 + jnp.arange(5.0))
        assert not bool(anym)
        assert float(jnp.abs(Hx).max()) == 0.0
        assert float(jnp.abs(r).max()) == 0.0


class TestObjectEkfUpdate:
    def test_update_reduces_clone_error(self):
        cfg, st, st_obj, data, wTc = make_world()
        # pin sigma_obj = the (noise-free) synthetic measurement scale: this
        # test checks the update algebra, not the production noise default
        cfg = FilterConfig(**{**cfg.__dict__, "observation_noise": 0.004,
                              "object_observation_noise": 0.004})
        lmc = ObjectLMConfig()
        chi2 = build_chi2_table(cfg, jnp.float64)
        # independent clone uncertainty (the reference contract test uses
        # setStateCov = Identity, orcvio.h:101); freshly-augmented clones are
        # otherwise perfectly correlated and only the gauge mode is reachable
        st = st.replace(P=jnp.eye(cfg.state_dim, dtype=jnp.float64) * 1e-2)
        dx = jnp.zeros(cfg.state_dim).at[LEG : LEG + 30].set(jnp.asarray(RNG.normal(size=30)) * 2e-3)
        st_pert = increment_state(cfg, st, dx)
        R2, t2 = cam_poses(st_pert)
        wTc_p = se3.make_pose(R2, t2)[:5]
        data_p = data._replace(cTw=se3.inverse_pose(wTc_p))
        exp = export_for_update(lmc, st_obj, data_p)
        st_new, used, _diag = object_ekf_update(cfg, st_pert, exp, wTc_p, jnp.arange(5.0), chi2)
        assert bool(used)
        # the correction must point along the true error (up to the 7-dof
        # similarity gauge the single-object residual cannot observe);
        # compare clone positions
        dp_est = (st_new.clones.p[:5] - st_pert.clones.p[:5]).reshape(-1)
        dp_true = (st.clones.p[:5] - st_pert.clones.p[:5]).reshape(-1)
        cos = float(jnp.dot(dp_est, dp_true) / (jnp.linalg.norm(dp_est) * jnp.linalg.norm(dp_true) + 1e-12))
        assert cos > 0.5, cos
        err_before = float(jnp.linalg.norm(dp_true))
        err_after = float(jnp.linalg.norm((st.clones.p[:5] - st_new.clones.p[:5]).reshape(-1)))
        assert err_after < 0.9 * err_before, (err_before, err_after)

    def test_gate_rejects_garbage(self):
        cfg, st, st_obj, data, wTc = make_world()
        lmc = ObjectLMConfig()
        chi2 = build_chi2_table(cfg, jnp.float64)
        # inconsistent per-element noise (not explainable by any object
        # motion, unlike a uniform shift) -> the post-projection residual is
        # large -> gate must reject
        data_bad = data._replace(zs=data.zs + jnp.asarray(RNG.normal(size=data.zs.shape)) * 0.3)
        exp = export_for_update(lmc, st_obj, data_bad)
        st_new, used, _diag = object_ekf_update(cfg, st, exp, wTc, jnp.arange(5.0), chi2)
        assert not bool(used)
        assert np.allclose(np.asarray(st_new.P), np.asarray(st.P))
