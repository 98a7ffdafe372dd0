"""Hybrid EKF-SLAM feature tests: Jacobian linearization, promotion/removal
lifecycle, and end-to-end accuracy with feature states enabled."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.filter import features as feat
from orcvio_tpu.filter.augment import cam_poses, increment_state, state_augmentation
from orcvio_tpu.filter.hybrid import (
    ekf_base,
    ekf_feature_rows,
    feature_world_points,
    remove_state_features,
    split_projection,
)
from orcvio_tpu.filter.pipeline import build_chi2_table, run_sequence
from orcvio_tpu.filter.state import LEG, FilterState
from orcvio_tpu.math import so3

RNG = np.random.default_rng(17)


def build_state_with_ekf_feature(cfg):
    """State with clones + one in-state feature with known idp/anchor."""
    st = FilterState.create(cfg, jnp.float64)
    for i in range(4):
        R = so3.exp(jnp.asarray(RNG.normal(size=3) * 0.1))
        p = jnp.asarray([0.5 * i, 0.1 * i, 0.05 * i])
        imu = st.imu.replace(R=R, p=p)
        st = st.replace(imu=imu, imu_fej_now=imu, t=jnp.asarray(float(i)))
        st = state_augmentation(cfg, st)
    # feature anchored at slot 1, observed at slot 3 (current)
    R_c2w, t_c_w = cam_poses(st)
    p_w_true = jnp.asarray([1.0, 0.4, 6.0])
    p_ca = R_c2w[1].T @ (p_w_true - t_c_w[1])
    idp = jnp.asarray([p_ca[0] / p_ca[2], p_ca[1] / p_ca[2], 1.0 / p_ca[2]])
    ft = st.features
    pc3 = R_c2w[3].T @ (p_w_true - t_c_w[3])
    z3 = pc3[:2] / pc3[2]
    ft = ft.replace(
        fid=ft.fid.at[0].set(7),
        active=ft.active.at[0].set(True),
        in_state=ft.in_state.at[0].set(True),
        state_slot=ft.state_slot.at[0].set(0),
        anchor_slot=ft.anchor_slot.at[0].set(1),
        idp=ft.idp.at[0].set(idp),
        uv=ft.uv.at[0, 3].set(z3),
        uv_valid=ft.uv_valid.at[0, 3].set(True).at[0, 1].set(True),
    )
    return st.replace(features=ft), p_w_true


class TestEkfRows:
    def test_zero_residual_at_truth(self):
        cfg = FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4)
        st, p_w = build_state_with_ekf_feature(cfg)
        er = ekf_feature_rows(cfg, st, jnp.asarray(3))
        assert bool(er.valid[0])
        assert np.allclose(np.asarray(er.r[0]), 0.0, atol=1e-12)

    def test_linearization(self):
        cfg = FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4)
        st, p_w = build_state_with_ekf_feature(cfg)
        D = cfg.state_dim
        dx = jnp.zeros(D)
        # perturb clone 1 (anchor), clone 3 (current), and the feature block
        idx = np.concatenate([
            np.arange(LEG + 6 * 1, LEG + 6 * 2),
            np.arange(LEG + 6 * 3, LEG + 6 * 4),
            np.arange(ekf_base(cfg), ekf_base(cfg) + 3),
        ])
        dx = dx.at[jnp.asarray(idx)].set(jnp.asarray(RNG.normal(size=len(idx)) * 1e-5))
        st_pert = increment_state(cfg, st, dx)
        er = ekf_feature_rows(cfg, st_pert, jnp.asarray(3))
        # delta = true - est = -dx; r ~ H delta
        pred = er.H[0] @ (-dx)
        assert np.allclose(np.asarray(er.r[0]), np.asarray(pred), atol=1e-8), (
            np.asarray(er.r[0]), np.asarray(pred)
        )

    def test_anchor_observation_rows(self):
        cfg = FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4)
        st, p_w = build_state_with_ekf_feature(cfg)
        ft = st.features
        st = st.replace(features=ft.replace(
            uv=ft.uv.at[0, 1].set(ft.idp[0, :2]),
        ))
        er = ekf_feature_rows(cfg, st, jnp.asarray(1))
        assert bool(er.valid[0])
        assert np.allclose(np.asarray(er.r[0]), 0.0, atol=1e-12)
        # H nonzero only on the feature block's alpha/beta
        H = np.asarray(er.H[0])
        c0 = ekf_base(cfg)
        assert np.allclose(np.delete(H, [c0, c0 + 1], axis=1), 0.0)


class TestSplitProjection:
    def test_information_preserved(self):
        m, D = 10, 20
        Hf = jnp.asarray(RNG.normal(size=(m, 3)))
        H = jnp.asarray(RNG.normal(size=(m, D)))
        r = jnp.asarray(RNG.normal(size=m))
        H1, H2, r1, Ho, ro = split_projection(Hf, H, r)
        # reconstruction: total information preserved
        lhs = H1.T @ H1 + Ho.T @ Ho
        assert np.allclose(np.asarray(lhs), np.asarray(H.T @ H), atol=1e-9)
        # Ho rows are feature-free: the projected Hf part vanishes
        Q, _ = np.linalg.qr(np.asarray(Hf), mode="complete")
        Hf_o = (Q.T @ np.asarray(Hf))[3:]
        assert np.allclose(Hf_o, 0.0, atol=1e-10)


class TestLifecycle:
    def test_remove_zeroes_blocks(self):
        cfg = FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4)
        st, _ = build_state_with_ekf_feature(cfg)
        c0 = ekf_base(cfg)
        st = st.replace(P=jnp.asarray(np.eye(cfg.state_dim)))
        kill = jnp.zeros(cfg.max_features, bool).at[0].set(True)
        st2 = remove_state_features(cfg, st, kill)
        assert not bool(st2.features.in_state[0])
        assert np.allclose(np.asarray(st2.P[c0 : c0 + 3, :]), 0.0)

    def test_e2e_hybrid_tracks_truth(self):
        sim = SimConfig(n_frames=120, n_landmarks=300, max_obs=50, uv_noise=0.002, seed=3)
        cfg = FilterConfig(
            sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
            observation_noise=0.004, tri_translation_threshold=-1.0,
            ekf_feature_cap=12,
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
        st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu,
                        R_b2c=R_b2c, t_c_b=t_c_b,
                        P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_sequence(cfg, st, data.frames, chi2)
        err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
        assert np.isfinite(err).all()
        rmse = float(np.sqrt((err**2).mean()))
        assert rmse < 0.15, rmse
        # EKF features actually got promoted at some point
        assert int(jnp.sum(final.features.in_state)) + 1 >= 1  # at least ran the path


class Test1dIdp:
    def test_e2e_1didp_tracks_truth(self):
        sim = SimConfig(n_frames=100, n_landmarks=300, max_obs=50, uv_noise=0.002, seed=4)
        cfg = FilterConfig(
            sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
            observation_noise=0.004, tri_translation_threshold=-1.0,
            ekf_feature_cap=12, feature_idp_dim=1,
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
        st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu,
                        R_b2c=R_b2c, t_c_b=t_c_b,
                        P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
        from orcvio_tpu.filter.pipeline import build_chi2_table, run_sequence

        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_sequence(cfg, st, data.frames, chi2)
        err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
        assert np.isfinite(err).all()
        rmse = float(np.sqrt((err**2).mean()))
        assert rmse < 0.15, rmse


class TestSchmidt:
    def make_cfg(self):
        return FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4,
                            use_schmidt=True, nuisance_cap=3)

    def test_demote_moves_blocks_and_remaps(self):
        from orcvio_tpu.filter.hybrid import nui_base, schmidt_demote

        cfg = self.make_cfg()
        st, _ = build_state_with_ekf_feature(cfg)
        st = st.replace(P=jnp.asarray(np.diag(np.arange(1.0, cfg.state_dim + 1))))
        # prune the anchor slot (1)
        pm = jnp.zeros(cfg.sw_size, bool).at[1].set(True)
        st2 = schmidt_demote(cfg, st, pm)
        assert bool(st2.nui.valid[0])
        assert int(st2.features.anchor_slot[0]) == cfg.sw_size + 0
        c0 = LEG + 6 * 1
        n0 = nui_base(cfg)
        # the clone diag block moved to the nuisance block
        assert np.allclose(np.asarray(st2.P[n0:n0+6, n0:n0+6]),
                           np.asarray(st.P[c0:c0+6, c0:c0+6]))
        assert np.allclose(np.asarray(st2.nui.p[0]), np.asarray(st.clones.p[1]))

    def test_nuisance_rows_h_matches_active_case(self):
        from orcvio_tpu.filter.hybrid import ekf_feature_rows, nui_base, schmidt_demote

        cfg = self.make_cfg()
        st, _ = build_state_with_ekf_feature(cfg)
        er_active = ekf_feature_rows(cfg, st, jnp.asarray(3))
        pm = jnp.zeros(cfg.sw_size, bool).at[1].set(True)
        st2 = schmidt_demote(cfg, st, pm)
        er_nui = ekf_feature_rows(cfg, st2, jnp.asarray(3))
        assert bool(er_nui.valid[0])
        H_a_active = np.asarray(er_active.H[0][:, LEG + 6 * 1 : LEG + 6 * 2])
        n0 = nui_base(cfg)
        H_a_nui = np.asarray(er_nui.H[0][:, n0 : n0 + 6])
        assert np.allclose(H_a_active, H_a_nui, atol=1e-12)
        assert np.allclose(np.asarray(er_active.r[0]), np.asarray(er_nui.r[0]), atol=1e-12)

    def test_schmidt_update_freezes_nuisance_block(self):
        from orcvio_tpu.filter.hybrid import nui_base, schmidt_demote
        from orcvio_tpu.filter.update import apply_ekf_update

        cfg = self.make_cfg()
        st, _ = build_state_with_ekf_feature(cfg)
        st = st.replace(P=jnp.eye(cfg.state_dim, dtype=jnp.float64) * 1e-2)
        pm = jnp.zeros(cfg.sw_size, bool).at[1].set(True)
        st = schmidt_demote(cfg, st, pm)
        n0 = nui_base(cfg)
        P_nn_before = np.asarray(st.P[n0:n0+6, n0:n0+6])
        rng = np.random.default_rng(0)
        H = jnp.asarray(rng.normal(size=(8, cfg.state_dim)) * 0.5)
        r = jnp.asarray(rng.normal(size=8) * 0.01)
        st2, dx = apply_ekf_update(cfg, st, H, r)
        # nuisance block frozen; symmetric; nuisance mean increments inert
        assert np.allclose(np.asarray(st2.P[n0:n0+6, n0:n0+6]), P_nn_before, atol=1e-12)
        assert np.allclose(np.asarray(st2.P), np.asarray(st2.P).T, atol=1e-12)
        assert np.allclose(np.asarray(st2.nui.p[0]), np.asarray(st.nui.p[0]))
        # active block did update
        assert not np.allclose(np.asarray(st2.P[:LEG, :LEG]), np.asarray(st.P[:LEG, :LEG]))

    def test_reference_schmidt_semantics_identical(self):
        """schmidt_reference_semantics replicates orcvio.cpp:1741-1756
        literally (full-gain (I-KH)P, restore the nuisance diagonal,
        symmetrize) — and coincides EXACTLY with textbook zero-gain Schmidt:
        with the optimal gain, (I-KH)P = P - P H^T S^-1 H P is symmetric, so
        the full-gain cross block equals the zero-gain one and the restored
        diagonal equals the untouched one. The deviation once listed in
        DEVIATIONS.md is therefore immaterial; this test pins the identity."""
        from dataclasses import replace as dc_replace

        from orcvio_tpu.filter.hybrid import nui_base, schmidt_demote
        from orcvio_tpu.filter.update import apply_ekf_update

        cfg = self.make_cfg()
        cfg_ref = dc_replace(cfg, schmidt_reference_semantics=True)
        st, _ = build_state_with_ekf_feature(cfg)
        st = st.replace(P=jnp.eye(cfg.state_dim, dtype=jnp.float64) * 1e-2)
        pm = jnp.zeros(cfg.sw_size, bool).at[1].set(True)
        st = schmidt_demote(cfg, st, pm)
        n0 = nui_base(cfg)
        # correlate nuisance with active states so the variants can differ
        rng = np.random.default_rng(1)
        C = jnp.asarray(rng.normal(size=(cfg.state_dim, cfg.state_dim)) * 0.03)
        P = st.P + 0.5 * (C @ C.T)
        st = st.replace(P=0.5 * (P + P.T))
        P_nn_before = np.asarray(st.P[n0:n0+6, n0:n0+6])
        H = jnp.asarray(rng.normal(size=(8, cfg.state_dim)) * 0.5)
        r = jnp.asarray(rng.normal(size=8) * 0.01)
        st_tb, dx_tb = apply_ekf_update(cfg, st, H, r)
        st_rf, dx_rf = apply_ekf_update(cfg_ref, st, H, r)
        # nuisance block frozen and P symmetric in both
        assert np.allclose(np.asarray(st_rf.P[n0:n0+6, n0:n0+6]), P_nn_before,
                           atol=1e-12)
        assert np.allclose(np.asarray(st_rf.P), np.asarray(st_rf.P).T, atol=1e-12)
        # active-state mean increments identical (K_a independent of K_n)
        assert np.allclose(np.asarray(dx_rf[:n0]), np.asarray(dx_tb[:n0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(st_rf.imu.p), np.asarray(st_tb.imu.p))
        # the two formulations agree on the ENTIRE covariance (fp-level)
        np.testing.assert_allclose(np.asarray(st_rf.P), np.asarray(st_tb.P),
                                   atol=1e-12)

    def test_e2e_schmidt_tracks_truth(self):
        sim = SimConfig(n_frames=120, n_landmarks=300, max_obs=50, uv_noise=0.002, seed=5)
        cfg = FilterConfig(
            sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
            observation_noise=0.004, tri_translation_threshold=-1.0,
            ekf_feature_cap=12, use_schmidt=True, nuisance_cap=6,
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
        st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu,
                        R_b2c=R_b2c, t_c_b=t_c_b,
                        P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_sequence(cfg, st, data.frames, chi2)
        err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
        assert np.isfinite(err).all()
        rmse = float(np.sqrt((err**2).mean()))
        assert rmse < 0.15, rmse


class TestReanchor:
    def _world_marginal(self, cfg, st, f=0):
        """Sigma_pw = G P G^T of the feature's world point, from its current
        anchor/idp/extrinsic blocks (same perturbation conventions as
        reanchor_features)."""
        from orcvio_tpu.filter.hybrid import ekf_base as _base, idp_dim

        ft = st.features
        B = idp_dim(cfg)
        a = int(ft.anchor_slot[f])
        slot = int(ft.state_slot[f])
        Ra = st.clones.R[a]
        pa = st.clones.p[a]
        idp = ft.idp[f]
        D = st.P.shape[0]

        def pw(delta):
            didp, dth, dp = delta[:3], delta[3:6], delta[6:9]
            dthe, dte = delta[9:12], delta[12:15]
            Rbc = st.R_b2c @ so3.exp(-dthe)
            tcb = st.t_c_b + dte
            idp_p = idp + didp
            p_ca = jnp.stack([idp_p[0] / idp_p[2], idp_p[1] / idp_p[2], 1.0 / idp_p[2]])
            return so3.exp(dth) @ Ra @ (Rbc.T @ p_ca + tcb) + pa + dp

        J = jax.jacfwd(pw)(jnp.zeros(15, jnp.float64))  # (3, 15)
        G = np.zeros((3, D))
        c0 = _base(cfg) + B * slot
        if B == 3:
            G[:, c0:c0 + 3] = np.asarray(J[:, :3])
        else:
            G[:, c0:c0 + 1] = np.asarray(J[:, 2:3])
        G[:, LEG + 6 * a: LEG + 6 * a + 6] = np.asarray(J[:, 3:9])
        G[:, 15:21] = np.asarray(J[:, 9:15])
        return G @ np.asarray(st.P) @ G.T

    @pytest.mark.parametrize("idp_dim_", [3, 1])
    def test_mean_and_marginal_preserved(self, idp_dim_):
        from orcvio_tpu.filter.hybrid import feature_world_points, reanchor_features

        cfg = FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4,
                           feature_idp_dim=idp_dim_)
        st, p_w_true = build_state_with_ekf_feature(cfg)
        D = cfg.state_dim
        A = RNG.normal(size=(D, D)) * 0.01
        P = A @ A.T + np.eye(D) * 1e-4
        st = st.replace(P=jnp.asarray(P))

        sig_before = self._world_marginal(cfg, st)
        pw_before, _ = feature_world_points(st, cfg)

        prune = jnp.zeros(cfg.sw_size, bool).at[1].set(True)
        st2 = reanchor_features(cfg, st, prune, jnp.asarray(3))

        assert int(st2.features.anchor_slot[0]) == 3
        pw_after, _ = feature_world_points(st2, cfg)
        assert np.allclose(np.asarray(pw_after[0]), np.asarray(pw_before[0]), atol=1e-10)
        sig_after = self._world_marginal(cfg, st2)
        if idp_dim_ == 3:
            # 3d: the world-point marginal is invariant under the anchor change
            assert np.allclose(sig_after, sig_before, rtol=1e-6, atol=1e-12), (
                sig_before, sig_after)
        else:
            # 1d: the new anchor bearing (alpha, beta) is refreshed
            # deterministically (reference fixes obs_anchor the same way,
            # orcvio.cpp:2712), so its uncertainty is discarded and the world
            # marginal shrinks along the bearing directions; the depth (rho)
            # variance must still match direct propagation through the exact
            # re-parametrization Jacobian
            rho_var_after = float(st2.P[ekf_base(cfg), ekf_base(cfg)])
            j = self._reanchor_rho_row(cfg, st)
            rho_var_expect = float(j @ np.asarray(st.P) @ j)
            assert rho_var_after == pytest.approx(rho_var_expect, rel=1e-8)
            # (sig_after vs sig_before is NOT ordered for 1d: the bearing
            # uncertainty swap is not PSD-monotone — only rho is exact)
            del sig_after, sig_before
        # P stays symmetric PSD
        w = np.linalg.eigvalsh(np.asarray(st2.P))
        assert w.min() > -1e-10

    def _reanchor_rho_row(self, cfg, st, f=0):
        """Global row vector j with rho_new ~ j @ delta_state, built
        independently of reanchor_features (same generative model)."""
        ft = st.features
        a = int(ft.anchor_slot[f])
        Ra = st.clones.R[a]
        pa = st.clones.p[a]
        Rk = st.clones.R[3]
        pk = st.clones.p[3]
        idp = ft.idp[f]
        D = st.P.shape[0]

        def rho_new(delta):
            drho, dth_a, dp_a = delta[0], delta[1:4], delta[4:7]
            dth_k, dp_k = delta[7:10], delta[10:13]
            dthe, dte = delta[13:16], delta[16:19]
            Rbc = st.R_b2c @ so3.exp(-dthe)
            tcb = st.t_c_b + dte
            rho = idp[2] + drho
            p_ca = jnp.stack([idp[0] / rho, idp[1] / rho, 1.0 / rho])
            p_w = so3.exp(dth_a) @ Ra @ (Rbc.T @ p_ca + tcb) + pa + dp_a
            p_ck = Rbc @ ((so3.exp(dth_k) @ Rk).T @ (p_w - pk - dp_k) - tcb)
            return 1.0 / p_ck[2]

        Jr = np.asarray(jax.jacfwd(rho_new)(jnp.zeros(19, jnp.float64)))
        j = np.zeros(D)
        j[ekf_base(cfg)] = Jr[0]
        j[LEG + 6 * a: LEG + 6 * a + 6] = Jr[1:7]
        j[LEG + 6 * 3: LEG + 6 * 3 + 6] = Jr[7:13]
        j[15:21] = Jr[13:19]
        return j

    def test_degenerate_falls_through(self):
        """A feature whose world point is behind the new anchor is left
        untouched (removal pass handles it)."""
        from orcvio_tpu.filter.hybrid import reanchor_features

        cfg = FilterConfig(sw_size=6, max_features=8, ekf_feature_cap=4)
        st, _ = build_state_with_ekf_feature(cfg)
        # move the feature behind every camera: negative depth from slot 3
        R_c2w, t_c_w = cam_poses(st)
        p_back = t_c_w[3] - R_c2w[3] @ jnp.asarray([0.0, 0.0, 5.0])
        p_ca = R_c2w[1].T @ (p_back - t_c_w[1])
        ft = st.features
        idp = jnp.asarray([p_ca[0] / p_ca[2], p_ca[1] / p_ca[2], 1.0 / p_ca[2]])
        st = st.replace(features=ft.replace(idp=ft.idp.at[0].set(idp)))
        prune = jnp.zeros(cfg.sw_size, bool).at[1].set(True)
        st2 = reanchor_features(cfg, st, prune, jnp.asarray(3))
        assert int(st2.features.anchor_slot[0]) == 1  # unchanged -> removal pass


class TestPromotedFeatureFreeRows:
    def test_idp_split_matches_pw_nullspace_info_3d(self):
        """For 3d idp, the feature-free rows of the Hf_idp QR split span the
        same row space as the p_w-nullspace projection (Hf_idp = Hf_raw @
        dpw_didp with full-rank dpw_didp), so the stacked update gains exactly
        the reference's rows and no double counting."""
        m, D = 12, 30
        Hf_raw = jnp.asarray(RNG.normal(size=(m, 3)))
        dpw_didp = jnp.asarray(RNG.normal(size=(3, 3)))  # full rank a.s.
        Hf_idp = Hf_raw @ dpw_didp
        H = jnp.asarray(RNG.normal(size=(m, D)))
        r = jnp.asarray(RNG.normal(size=m))
        _, _, _, Ho_idp, ro_idp = split_projection(Hf_idp, H, r)
        _, _, _, Ho_pw, ro_pw = split_projection(Hf_raw, H, r)
        # same information matrix and same projected residual information
        assert np.allclose(np.asarray(Ho_idp.T @ Ho_idp),
                           np.asarray(Ho_pw.T @ Ho_pw), atol=1e-9)
        assert np.allclose(np.asarray(Ho_idp.T @ ro_idp),
                           np.asarray(Ho_pw.T @ ro_pw), atol=1e-9)
        # and the feature columns vanish from Ho
        assert np.allclose(np.asarray(Ho_idp @ jnp.zeros((D,))), 0.0)

    def test_1didp_feature_free_rows_keep_bearing_info(self):
        """For 1d idp the split keeps m-1 rows (vs m-3 for the p_w
        projection): the bearing directions join the update."""
        m, D = 12, 30
        Hf_raw = jnp.asarray(RNG.normal(size=(m, 3)))
        Hf_rho = (Hf_raw @ jnp.asarray(RNG.normal(size=(3, 3))))[:, 2:3]
        H = jnp.asarray(RNG.normal(size=(m, D)))
        r = jnp.asarray(RNG.normal(size=m))
        _, _, _, Ho, _ = split_projection(Hf_rho, H, r)
        _, _, _, Ho_pw, _ = split_projection(Hf_raw, H, r)
        assert np.linalg.matrix_rank(np.asarray(Ho)) == m - 1
        assert np.linalg.matrix_rank(np.asarray(Ho_pw)) == m - 3
