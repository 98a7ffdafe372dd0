"""Filter-core tests: augmentation/pruning contracts (mirroring the intent of
the reference's test_state_update.cpp), triangulation on known geometry, and
the end-to-end synthetic-trajectory integration gate."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.synthetic import SimConfig, generate, imu_measurements, trajectory_pose
from orcvio_tpu.filter import features as feat
from orcvio_tpu.filter.augment import (
    cam_poses,
    current_clone_slot,
    increment_state,
    prune_clones,
    select_prune_slots,
    state_augmentation,
)
from orcvio_tpu.filter.pipeline import build_chi2_table, filter_step, run_sequence
from orcvio_tpu.filter.state import LEG, FilterState
from orcvio_tpu.filter.triangulation import triangulate
from orcvio_tpu.math import so3

# NB: every test draws from its own freshly-seeded generator — a shared
# module-level RNG makes noise draws depend on test execution order (flaky
# under pytest -n / -k subsets).


def small_cfg(**kw):
    kw.setdefault("sw_size", 6)
    kw.setdefault("max_features", 20)
    kw.setdefault("max_track_len", 4)
    return FilterConfig(**kw)


class TestAugmentPrune:
    def test_augmentation_covariance_projection(self):
        cfg = small_cfg()
        st = FilterState.create(cfg, dtype=jnp.float64)
        # randomize P (PSD)
        D = cfg.state_dim
        A = np.random.default_rng(7).normal(size=(D, D))
        P = jnp.asarray(A @ A.T)
        st = st.replace(P=P)
        st2 = state_augmentation(cfg, st)
        slot = int(current_clone_slot(st2))
        c = LEG + 6 * slot
        P2 = np.asarray(st2.P)
        J = np.zeros((6, D))
        J[0:3, 0:3] = np.eye(3)
        J[3:6, 6:9] = np.eye(3)
        Pn = np.asarray(P)
        assert np.allclose(P2[c : c + 6, c : c + 6], J @ Pn @ J.T, atol=1e-9)
        assert np.allclose(P2[c : c + 6, :c], (J @ Pn)[:, :c], atol=1e-9)
        assert bool(st2.clones.valid[slot])
        assert np.allclose(np.asarray(st2.clones.R[slot]), np.asarray(st.imu.R))

    def test_augment_fills_slots_in_order(self):
        cfg = small_cfg()
        st = FilterState.create(cfg, dtype=jnp.float64)
        for i in range(4):
            st = st.replace(imu=st.imu.replace(p=jnp.asarray([float(i), 0, 0])), t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
        assert int(jnp.sum(st.clones.valid)) == 4
        assert int(current_clone_slot(st)) == 3
        assert np.allclose(np.asarray(st.clones.p[:4, 0]), [0, 1, 2, 3])

    def test_prune_zeroes_blocks(self):
        cfg = small_cfg()
        st = FilterState.create(cfg, dtype=jnp.float64)
        for i in range(cfg.sw_size):
            st = st.replace(imu=st.imu.replace(p=jnp.asarray([float(i), 0, 0])), t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
        mask = jnp.zeros(cfg.sw_size, bool).at[0].set(True).at[2].set(True)
        st2 = prune_clones(st, mask)
        assert int(jnp.sum(st2.clones.valid)) == cfg.sw_size - 2
        for s in [0, 2]:
            c = LEG + 6 * s
            assert np.allclose(np.asarray(st2.P[c : c + 6, :]), 0)
            assert np.allclose(np.asarray(st2.P[:, c : c + 6]), 0)

    def test_select_prune_slots_redundant_vs_old(self):
        cfg = small_cfg()
        st = FilterState.create(cfg, dtype=jnp.float64)
        # clones along a line, last 4 nearly identical -> candidates redundant
        for i in range(cfg.sw_size):
            p = jnp.asarray([min(float(i), 2.0) * 1.0, 0, 0])
            st = st.replace(imu=st.imu.replace(p=p), t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
        mask, full = select_prune_slots(cfg, st, tracking_rate=jnp.asarray(0.9))
        assert bool(full)
        # slots 3 and 4 hold clones 3rd/2nd-from-latest (orders 3, 4): redundant
        assert bool(mask[3]) and bool(mask[4])
        # moving trajectory -> oldest pruned
        st = FilterState.create(cfg, dtype=jnp.float64)
        for i in range(cfg.sw_size):
            st = st.replace(imu=st.imu.replace(p=jnp.asarray([2.0 * i, 0, 0])), t=jnp.asarray(float(i)))
            st = state_augmentation(cfg, st)
        mask, _ = select_prune_slots(cfg, st, tracking_rate=jnp.asarray(0.9))
        assert bool(mask[0]) and bool(mask[1])

    def test_increment_state_left_right(self):
        for left in [True, False]:
            cfg = small_cfg(use_left_perturbation=left)
            st = FilterState.create(cfg, dtype=jnp.float64)
            st = state_augmentation(cfg, st)
            dx = jnp.asarray(np.random.default_rng(11 + int(left)).normal(size=cfg.state_dim) * 0.01)
            st2 = increment_state(cfg, st, dx)
            dR = so3.exp(dx[0:3])
            expect = dR @ st.imu.R if left else st.imu.R @ dR
            assert np.allclose(np.asarray(st2.imu.R), np.asarray(expect))
            assert np.allclose(np.asarray(st2.imu.v), np.asarray(st.imu.v + dx[3:6]))
            assert np.allclose(np.asarray(st2.td), np.asarray(st.td + dx[21]))

    def test_increment_discard_large(self):
        cfg = small_cfg()
        st = FilterState.create(cfg, dtype=jnp.float64)
        dx = jnp.zeros(cfg.state_dim).at[3].set(5.0)  # |dv| > 1
        st2 = increment_state(cfg, st, dx)
        assert np.allclose(np.asarray(st2.imu.v), np.asarray(st.imu.v))


class TestFeatureTable:
    def test_add_and_match(self):
        cfg = small_cfg()
        st = FilterState.create(cfg, dtype=jnp.float64)
        t = st.features
        fids = jnp.asarray([5, 9, 11, -1], jnp.int32)
        uvs = jnp.asarray(np.random.default_rng(13).normal(size=(4, 2)))
        mask = jnp.asarray([True, True, True, False])
        t, n = feat.add_observations(t, jnp.asarray(0), fids, uvs, uvs * 0, mask)
        assert int(n) == 0  # all new
        assert int(jnp.sum(t.fid >= 0)) == 3
        # second frame: 5 and 9 tracked, 11 lost, 13 new
        fids2 = jnp.asarray([5, 9, 13, -1], jnp.int32)
        t2, n2 = feat.add_observations(t, jnp.asarray(1), fids2, uvs, uvs * 0, mask)
        assert int(n2) == 2
        row5 = int(jnp.argmax(t2.fid == 5))
        assert bool(t2.uv_valid[row5, 0]) and bool(t2.uv_valid[row5, 1])
        row11 = int(jnp.argmax(t2.fid == 11))
        assert not bool(t2.active[row11])  # lost
        assert int(jnp.sum(t2.fid >= 0)) == 4

    def test_capacity_overflow_drops(self):
        cfg = small_cfg(max_features=2)
        st = FilterState.create(cfg, dtype=jnp.float64)
        fids = jnp.asarray([1, 2, 3], jnp.int32)
        uvs = jnp.zeros((3, 2))
        t, _ = feat.add_observations(st.features, jnp.asarray(0), fids, uvs, uvs, jnp.ones(3, bool))
        assert int(jnp.sum(t.fid >= 0)) == 2  # third dropped, no corruption


def make_ct(uv, mask, sw):
    """Build CompactTracks from dense (F, SW, 2) arrays for tests."""
    from orcvio_tpu.filter.state import FeatureTable
    from orcvio_tpu.filter.tracks import compact_tracks

    F = uv.shape[0]
    table = FeatureTable.empty(F, sw, uv.dtype).replace(
        uv=uv, uv_valid=mask,
        fid=jnp.arange(F, dtype=jnp.int32), active=jnp.ones(F, bool),
    )
    return compact_tracks(table, jnp.arange(sw, dtype=jnp.int32), sw)


class TestTriangulation:
    def test_known_geometry(self):
        cfg = small_cfg()
        sw = cfg.sw_size
        # cameras along x axis looking at +z
        R_c2w = jnp.tile(jnp.eye(3), (sw, 1, 1))
        t_c_w = jnp.stack([jnp.linspace(0, 1.0, sw), jnp.zeros(sw), jnp.zeros(sw)], axis=1)
        pts = jnp.asarray([[0.5, 0.3, 5.0], [-0.4, 0.2, 3.0]])
        uv = (pts[:, None, :2] - jnp.stack([t_c_w[:, 0], t_c_w[:, 1]], 1)[None]) / pts[:, None, 2:3]
        mask = jnp.ones((2, sw), bool)
        tri = triangulate(cfg, make_ct(uv, mask, sw), R_c2w, t_c_w)
        assert bool(tri.valid[0]) and bool(tri.valid[1])
        assert np.allclose(np.asarray(tri.p_world), np.asarray(pts), atol=1e-5)

    def test_noisy_masked(self):
        cfg = small_cfg()
        sw = cfg.sw_size
        R_c2w = jnp.tile(jnp.eye(3), (sw, 1, 1))
        t_c_w = jnp.stack([jnp.linspace(0, 1.0, sw), jnp.zeros(sw), jnp.zeros(sw)], axis=1)
        pts = jnp.asarray([[0.5, 0.3, 5.0]])
        uv = (pts[:, None, :2] - jnp.stack([t_c_w[:, 0], t_c_w[:, 1]], 1)[None]) / pts[:, None, 2:3]
        uv = uv + jnp.asarray(np.random.default_rng(17).normal(size=uv.shape)) * 1e-3
        mask = jnp.ones((1, sw), bool).at[0, 2].set(False)
        tri = triangulate(cfg, make_ct(uv, mask, sw), R_c2w, t_c_w)
        assert bool(tri.valid[0])
        # 1e-3 normalized-pixel noise at 5 m depth over ~5 views gives
        # 0.03-0.06 m depending on the draw; 0.1 (2% of depth) is the
        # draw-independent bound.
        assert np.allclose(np.asarray(tri.p_world[0]), np.asarray(pts[0]), atol=0.1)

    def test_insufficient_baseline_invalid(self):
        cfg = small_cfg()
        sw = cfg.sw_size
        R_c2w = jnp.tile(jnp.eye(3), (sw, 1, 1))
        t_c_w = jnp.zeros((sw, 3))  # no baseline
        uv = jnp.tile(jnp.asarray([[0.1, 0.2]]), (1, sw, 1))
        mask = jnp.ones((1, sw), bool)
        tri = triangulate(cfg, make_ct(uv, mask, sw), R_c2w, t_c_w)
        # degenerate: either flagged invalid or absurd depth — must not be NaN
        assert bool(jnp.all(jnp.isfinite(tri.p_world)))


CAM_FORWARD_R_B2C = jnp.asarray(
    # camera z = body x (forward), camera x = -body y, camera y = -body z
    [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]
)


class TestEndToEnd:
    def make_initial_state(self, cfg, sim, dtype=jnp.float64):
        st = FilterState.create(cfg, dtype=dtype)
        R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
        v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
        imu = st.imu.replace(R=R0.astype(dtype), p=p0.astype(dtype), v=v0.astype(dtype))
        # tight-ish initial covariance: we start at ground truth
        d = np.asarray(cfg.initial_cov_diag())
        d[:15] = 1e-6
        return st.replace(
            imu=imu, imu_fej_now=imu, imu_old=imu,
            R_b2c=CAM_FORWARD_R_B2C.astype(dtype),
            t_c_b=jnp.asarray([0.05, 0.02, 0.0], dtype),
            P=jnp.asarray(np.diag(d), dtype), initialized=jnp.ones((), bool),
            t=jnp.zeros((), dtype),
        )

    @pytest.mark.parametrize("left", [True, False])
    def test_synthetic_sequence_tracks_truth(self, left):
        sim = SimConfig(n_frames=150, n_landmarks=300, max_obs=50, uv_noise=0.002, seed=3)
        cfg = FilterConfig(
            sw_size=10, max_features=80, max_track_len=6, imu_slab=sim.imu_slab,
            observation_noise=0.004, use_left_perturbation=left,
            tri_translation_threshold=-1.0,  # disabled, as euroc.yaml does
        )
        st = self.make_initial_state(cfg, sim)
        data = generate(sim, R_b2c=st.R_b2c, t_c_b=st.t_c_b)
        chi2 = build_chi2_table(cfg, jnp.float64)
        final, outs = run_sequence(cfg, st, data.frames, chi2)
        err = np.linalg.norm(np.asarray(outs.p) - np.asarray(data.gt_p), axis=1)
        assert np.isfinite(err).all()
        # updates actually fire
        assert int(np.asarray(outs.n_update_features).sum()) > 20
        rmse = float(np.sqrt((err**2).mean()))
        assert rmse < 0.15, f"RMSE {rmse}"

        # dead-reckoning (no measurements) must be clearly worse
        frames_nomeas = data.frames._replace(meas_mask=jnp.zeros_like(data.frames.meas_mask))
        _, outs_dr = run_sequence(cfg, st, frames_nomeas, chi2)
        err_dr = np.linalg.norm(np.asarray(outs_dr.p) - np.asarray(data.gt_p), axis=1)
        assert err_dr[-1] > 2 * err[-1], (err_dr[-1], err[-1])

    def test_step_jits_and_matches_python(self):
        sim = SimConfig(n_frames=6, n_landmarks=100, max_obs=30, seed=5)
        cfg = FilterConfig(sw_size=6, max_features=40, max_track_len=3, imu_slab=sim.imu_slab,
                           observation_noise=0.004, tri_translation_threshold=-1.0)
        st = self.make_initial_state(cfg, sim)
        data = generate(sim, R_b2c=st.R_b2c, t_c_b=st.t_c_b)
        chi2 = build_chi2_table(cfg, jnp.float64)
        step_j = jax.jit(lambda s, f: filter_step(cfg, s, f, chi2))
        st_a = st
        st_b = st
        for k in range(6):
            fr = jax.tree.map(lambda x: x[k], data.frames)
            st_a, _ = filter_step(cfg, st_a, fr, chi2)
            st_b, _ = step_j(st_b, fr)
        assert np.allclose(np.asarray(st_a.imu.p), np.asarray(st_b.imu.p), atol=1e-9)
        assert np.allclose(np.asarray(st_a.P), np.asarray(st_b.P), atol=1e-8)
