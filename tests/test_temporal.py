"""Sequence/temporal parallelism: block-parallel replay of one trajectory.

Contract (parallel/temporal.py): the stitched block-parallel replay is
bit-exact serial at n_iters = n_blocks (full-state handoff crosses one
boundary per iteration), reaches statistical accuracy parity in far fewer
iterations (speedup n_blocks / n_iters), and runs identically under a real
device mesh (shard_map over an 'sp' axis) and the single-device vmap path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from orcvio_tpu.dataio.synthetic import SimConfig, generate
from orcvio_tpu.filter.pipeline import run_sequence
from orcvio_tpu.parallel.replay import make_mesh
from orcvio_tpu.parallel.temporal import (
    Gauge,
    gauge_apply,
    gauge_compose,
    gauge_diff,
    seq_parallel_replay,
)

pytestmark = pytest.mark.slow  # >60 s e2e module; deselect with -m 'not slow'

CFG_KW = dict(sw_size=10, max_features=80, max_track_len=6, imu_slab=12,
              observation_noise=0.004, tri_translation_threshold=-1.0)
SIM_KW = dict(n_frames=120, n_landmarks=300, max_obs=40, imu_slab=12, seed=0)


@pytest.fixture(scope="module")
def setup():
    cfg, st, frames, chi2 = ge._build(CFG_KW, SIM_KW, jnp.float64)
    end_s, outs_s = jax.jit(lambda s, f: run_sequence(cfg, s, f, chi2))(st, frames)
    return cfg, st, frames, chi2, end_s, outs_s


class TestGaugeGroup:
    def test_compose_associative(self):
        g1 = Gauge(jnp.asarray(0.3), jnp.asarray([1.0, -2.0, 0.5]))
        g2 = Gauge(jnp.asarray(-0.7), jnp.asarray([0.2, 0.1, -1.0]))
        g3 = Gauge(jnp.asarray(1.1), jnp.asarray([-0.4, 0.9, 2.0]))
        a = gauge_compose(gauge_compose(g1, g2), g3)
        b = gauge_compose(g1, gauge_compose(g2, g3))
        np.testing.assert_allclose(a.psi, b.psi, atol=1e-12)
        np.testing.assert_allclose(a.dp, b.dp, atol=1e-12)

    def test_equivariance_and_diff(self, setup):
        """Gauge-moving a start state gauge-moves the replay output exactly —
        the property the cross-block composition rests on."""
        cfg, st, frames, chi2, end_s, _ = setup
        half = jax.tree.map(lambda x: x[:60], frames)
        rest = jax.tree.map(lambda x: x[60:], frames)
        runner = jax.jit(lambda s, f: run_sequence(cfg, s, f, chi2))
        mid, _ = runner(st, half)
        end_ref, _ = runner(mid, rest)
        g = Gauge(jnp.asarray(0.3), jnp.asarray([0.5, -0.2, 0.1]))
        end_g, _ = runner(gauge_apply(cfg, mid, g), rest)
        end_expect = gauge_apply(cfg, end_ref, g)
        np.testing.assert_allclose(end_g.imu.p, end_expect.imu.p, atol=1e-8)
        np.testing.assert_allclose(end_g.imu.R, end_expect.imu.R, atol=1e-8)
        np.testing.assert_allclose(end_g.P, end_expect.P, atol=1e-8)
        rec = gauge_diff(end_g, end_ref)
        np.testing.assert_allclose(rec.psi, 0.3, atol=1e-8)
        np.testing.assert_allclose(rec.dp, [0.5, -0.2, 0.1], atol=1e-8)


class TestSeqParallel:
    def test_exact_at_k_iterations(self, setup):
        """n_iters = n_blocks reproduces the serial replay bit-for-bit (fp)."""
        cfg, st, frames, chi2, end_s, outs_s = setup
        K = 4
        end_p, outs_p = seq_parallel_replay(cfg, st, frames, chi2,
                                            n_blocks=K, n_iters=K)
        np.testing.assert_allclose(outs_p["p"], np.asarray(outs_s.p), atol=1e-8)
        np.testing.assert_allclose(end_p.imu.p, end_s.imu.p, atol=1e-8)
        np.testing.assert_allclose(end_p.imu.R, end_s.imu.R, atol=1e-8)
        np.testing.assert_allclose(end_p.P, end_s.P, atol=1e-8)

    def test_accuracy_parity_few_iterations(self, setup):
        """At n_iters=2 (speedup K/2) the parallel trajectory matches the
        serial filter's accuracy against ground truth, and the serial-vs-
        parallel discrepancy stays below the filter's own error level."""
        cfg, st, frames, chi2, end_s, outs_s = setup
        data = generate(
            SimConfig(**SIM_KW),
            R_b2c=np.asarray(st.R_b2c, np.float64),
            t_c_b=np.asarray(st.t_c_b, np.float64),
        )
        gt_p = np.asarray(data.gt_p)
        p_s = np.asarray(outs_s.p)
        rmse_s = np.sqrt(((p_s - gt_p) ** 2).sum(1).mean())

        end_p, outs_p = seq_parallel_replay(cfg, st, frames, chi2,
                                            n_blocks=4, n_iters=2)
        p_p = np.asarray(outs_p["p"])
        rmse_p = np.sqrt(((p_p - gt_p) ** 2).sum(1).mean())
        assert rmse_p < 1.3 * rmse_s + 0.02, (rmse_p, rmse_s)
        dtraj = np.linalg.norm(p_p - p_s, axis=1)
        assert dtraj.mean() < max(rmse_s, 0.05), (dtraj.mean(), rmse_s)

    def test_mesh_matches_vmap(self, setup):
        """The shard_map path over a real 8-device 'sp' mesh computes the
        same result as the single-device vmap path."""
        cfg, st, frames, chi2, _, _ = setup
        mesh = make_mesh(8, axis="sp")
        end_m, outs_m = seq_parallel_replay(cfg, st, frames, chi2,
                                            n_blocks=8, n_iters=2, mesh=mesh)
        end_v, outs_v = seq_parallel_replay(cfg, st, frames, chi2,
                                            n_blocks=8, n_iters=2)
        np.testing.assert_allclose(outs_m["p"], outs_v["p"], atol=1e-9)
        np.testing.assert_allclose(end_m.P, end_v.P, atol=1e-9)

    def test_rejects_hybrid_config(self, setup):
        cfg, st, frames, chi2, _, _ = setup
        from dataclasses import replace

        bad = replace(cfg, ekf_feature_cap=8)
        with pytest.raises(ValueError):
            seq_parallel_replay(bad, st, frames, chi2, n_blocks=4)


class TestGaugeCovarianceCorrection:
    def test_gauge_covariance_calibrated(self, setup):
        """At n_iters < K the end-state covariance misses the earlier blocks'
        unobservable-gauge random walk; the measured per-block correction
        restores it toward the serial filter's level (round-4 VERDICT #7).

        A tight initial prior (1e-8) makes the accumulated gauge walk the
        dominant term — with the default 1 m^2 position prior the walk is
        invisible against the prior passthrough and the comparison is noise.
        """
        from orcvio_tpu.parallel.temporal import gauge_covariance

        cfg, st, frames, chi2, _end_s, _outs_s = setup
        st = st.replace(P=jnp.eye(st.P.shape[0], dtype=st.P.dtype) * 1e-8)
        end_s, _ = jax.jit(lambda s, f: run_sequence(cfg, s, f, chi2))(st, frames)
        anchor = end_s.imu.p
        sig_serial = np.asarray(gauge_covariance(cfg, end_s, anchor))
        d_s = np.diag(sig_serial)
        for n_iters in (2, 3):
            end_c, _ = seq_parallel_replay(cfg, st, frames, chi2, n_blocks=4,
                                           n_iters=n_iters,
                                           gauge_cov_correction=True)
            end_u, _ = seq_parallel_replay(cfg, st, frames, chi2, n_blocks=4,
                                           n_iters=n_iters,
                                           gauge_cov_correction=False)
            d_c = np.diag(np.asarray(gauge_covariance(cfg, end_c, anchor)))
            d_u = np.diag(np.asarray(gauge_covariance(cfg, end_u, anchor)))
            # the yaw + horizontal-translation walk (dims 0..2; vertical
            # translation couples into observable pitch/roll and is excluded)
            w = slice(0, 3)
            assert np.all(d_u[w] <= d_s[w] * 1.05), (n_iters, d_u, d_s)
            assert np.all(d_c[w] >= 0.35 * d_s[w]), (n_iters, d_c, d_s)
            assert np.all(d_c[w] <= 2.5 * d_s[w]), (n_iters, d_c, d_s)
            # the correction is a calibrated bound, not an equality: the
            # gauge subspace has no invariant 4-dim coordinate (the yaw /
            # translation split rotates with the trajectory), so measured
            # increments land within a band of the serial value rather than
            # on it (measured: yaw 1.4-1.6x over, translation 0.5-1.0x)
