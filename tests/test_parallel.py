"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel replay and
the feature-parallel (information-form psum) update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.filter.pipeline import build_chi2_table, run_sequence
from orcvio_tpu.filter.state import FilterState
from orcvio_tpu.parallel.feature_parallel import (
    feature_parallel_update,
    information_from_jacobians,
    information_update,
)
from orcvio_tpu.parallel.replay import make_mesh, shard_batch, sharded_replay_fn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def make_ready_state(cfg, sim, seed=3):
    R_b2c = jnp.asarray([[0.0, -1, 0], [0, 0, -1], [1.0, 0, 0]])
    data = generate(sim, R_b2c=R_b2c)
    st = FilterState.create(cfg, jnp.float64)
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    d = np.asarray(cfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c,
                    P=jnp.asarray(np.diag(d)), initialized=jnp.ones((), bool))
    return st, data


class TestDataParallelReplay:
    def test_dp_replay_matches_single(self):
        sim = SimConfig(n_frames=20, n_landmarks=150, max_obs=30, imu_slab=12, seed=3)
        cfg = FilterConfig(sw_size=6, max_features=40, max_track_len=4, imu_slab=12,
                           observation_noise=0.004, tri_translation_threshold=-1.0)
        st, data = make_ready_state(cfg, sim)
        chi2 = build_chi2_table(cfg, jnp.float64)
        # single-device reference
        final1, outs1 = run_sequence(cfg, st, data.frames, chi2)

        B = 8
        mesh = make_mesh(B)
        states = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
        seqs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data.frames)
        states = shard_batch(states, mesh)
        seqs = shard_batch(seqs, mesh)
        fn = sharded_replay_fn(cfg, mesh)
        finalB, outsB = fn(states, seqs, chi2)
        pB = np.asarray(outsB.p)
        for b in range(B):
            assert np.allclose(pB[b], np.asarray(outs1.p), atol=1e-10)


class TestFeatureParallel:
    def test_information_update_matches_stacked(self):
        """Information-form update == stacked-QR update (same Lambda, b)."""
        from orcvio_tpu.filter.augment import cam_poses, state_augmentation
        from orcvio_tpu.filter import features as feat
        from orcvio_tpu.filter.tracks import compact_tracks
        from orcvio_tpu.filter.triangulation import triangulate
        from orcvio_tpu.filter.update import apply_ekf_update, feature_jacobians
        from orcvio_tpu.math import so3

        rng = np.random.default_rng(4)
        cfg = FilterConfig(sw_size=6, max_features=16, max_track_len=4,
                           observation_noise=0.004, tri_translation_threshold=-1.0)
        st = FilterState.create(cfg, jnp.float64)
        lm = rng.normal(size=(16, 3)) * 2 + [0, 0, 8]
        for i in range(5):
            R = so3.exp(jnp.asarray(rng.normal(size=3) * 0.05))
            p = jnp.asarray([0.4 * i, 0.05 * i, 0.0])
            imu = st.imu.replace(R=R, p=p)
            st = st.replace(imu=imu, imu_fej_now=imu, t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
            R_c2w, t_c_w = cam_poses(st)
            pc = (lm - np.asarray(t_c_w[i])) @ np.asarray(R_c2w[i])
            uv = jnp.asarray(pc[:, :2] / pc[:, 2:3] + rng.normal(size=(16, 2)) * 1e-3)
            tb, _ = feat.add_observations(
                st.features, jnp.asarray(i), jnp.arange(16, dtype=jnp.int32), uv, uv * 0,
                jnp.ones(16, bool))
            st = st.replace(features=tb)
        st = st.replace(P=jnp.eye(cfg.state_dim, dtype=jnp.float64) * 1e-2)
        ct = compact_tracks(st.features, st.clones.order, cfg.max_track_len)
        R_c2w, t_c_w = cam_poses(st)
        tri = triangulate(cfg, ct, R_c2w, t_c_w)
        fj = feature_jacobians(cfg, st, ct, tri.p_world)
        use = tri.valid & (2 * ct.n_obs > 3)
        assert int(use.sum()) > 8

        # stacked path
        Hm = jnp.where(use[:, None, None], fj.H, 0.0).reshape(-1, cfg.state_dim)
        rm = jnp.where(use[:, None], fj.r, 0.0).reshape(-1)
        st_a, dx_a = apply_ekf_update(cfg, st, Hm, rm)
        # information path
        Lam, b = information_from_jacobians(fj, use)
        st_b, dx_b = information_update(cfg, st, Lam, b)
        assert np.allclose(np.asarray(dx_a), np.asarray(dx_b), atol=1e-6)
        assert np.allclose(np.asarray(st_a.P), np.asarray(st_b.P), atol=1e-6)

        # sharded path over 8 devices == single-device information path
        mesh = make_mesh(8, axis="fp")
        fn = feature_parallel_update(cfg, mesh)
        st_c, dx_c = fn(st, ct, tri.p_world, use)
        assert np.allclose(np.asarray(dx_c), np.asarray(dx_b), atol=1e-8)
        assert np.allclose(np.asarray(st_c.P), np.asarray(st_b.P), atol=1e-8)

    def test_feature_cap_not_multiple_of_devices(self):
        """Capacity 21 on 8 devices: zero-padding must keep the update exact."""
        from orcvio_tpu.filter.augment import cam_poses, state_augmentation
        from orcvio_tpu.filter import features as feat
        from orcvio_tpu.filter.tracks import compact_tracks
        from orcvio_tpu.filter.triangulation import triangulate
        from orcvio_tpu.filter.update import feature_jacobians
        from orcvio_tpu.math import so3

        rng = np.random.default_rng(6)
        F = 21
        cfg = FilterConfig(sw_size=6, max_features=F, max_track_len=4,
                           observation_noise=0.004, tri_translation_threshold=-1.0)
        st = FilterState.create(cfg, jnp.float64)
        lm = rng.normal(size=(F, 3)) * 2 + [0, 0, 8]
        for i in range(5):
            R = so3.exp(jnp.asarray(rng.normal(size=3) * 0.05))
            p = jnp.asarray([0.4 * i, 0.05 * i, 0.0])
            imu = st.imu.replace(R=R, p=p)
            st = st.replace(imu=imu, imu_fej_now=imu, t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
            R_c2w, t_c_w = cam_poses(st)
            pc = (lm - np.asarray(t_c_w[i])) @ np.asarray(R_c2w[i])
            uv = jnp.asarray(pc[:, :2] / pc[:, 2:3] + rng.normal(size=(F, 2)) * 1e-3)
            tb, _ = feat.add_observations(
                st.features, jnp.asarray(i), jnp.arange(F, dtype=jnp.int32), uv, uv * 0,
                jnp.ones(F, bool))
            st = st.replace(features=tb)
        st = st.replace(P=jnp.eye(cfg.state_dim, dtype=jnp.float64) * 1e-2)
        ct = compact_tracks(st.features, st.clones.order, cfg.max_track_len)
        R_c2w, t_c_w = cam_poses(st)
        tri = triangulate(cfg, ct, R_c2w, t_c_w)
        fj = feature_jacobians(cfg, st, ct, tri.p_world)
        use = tri.valid & (2 * ct.n_obs > 3)
        Lam, b = information_from_jacobians(fj, use)
        st_b, dx_b = information_update(cfg, st, Lam, b)
        mesh = make_mesh(8, axis="fp")
        fn = feature_parallel_update(cfg, mesh)
        st_c, dx_c = fn(st, ct, tri.p_world, use)
        assert np.allclose(np.asarray(dx_c), np.asarray(dx_b), atol=1e-8)
        assert np.allclose(np.asarray(st_c.P), np.asarray(st_b.P), atol=1e-8)


class TestVmapBatchEval:
    def test_vmap_matches_serial(self):
        """vmapped multi-sequence run gives the same metrics as serial runs."""
        from orcvio_tpu.config.core import FilterConfig
        from orcvio_tpu.dataio.synthetic import SimConfig
        from orcvio_tpu.eval.batch import run_synthetic_batch_vmap, run_synthetic_case

        base = dict(sw_size=8, max_features=60, max_track_len=4, imu_slab=12,
                    observation_noise=0.004, tri_translation_threshold=-1.0)
        cfg = FilterConfig(**base)
        sim_kw = dict(n_frames=40, n_landmarks=200, max_obs=40, imu_slab=12, uv_noise=0.002)
        sims = [SimConfig(**{**sim_kw, "seed": s}) for s in (3, 4)]
        batched = run_synthetic_batch_vmap(cfg, sims)
        for sim, got in zip(sims, batched):
            ref = run_synthetic_case(cfg, sim)
            assert got["rmse_pos_m"] == pytest.approx(ref["rmse_pos_m"], rel=1e-3, abs=1e-5), (
                sim.seed, got, ref)
            assert got["updates"] == ref["updates"], sim.seed
            assert got["rmse_pos_m"] < 0.3
