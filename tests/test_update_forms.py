"""QR-compressed vs information-form stacked update equivalence.

The information form (Lambda = H^T H) is the MXU-native replacement for the
tall-skinny QR compression (ROADMAP hotspot); they are the same update by the
matrix-inversion lemma, up to the rank-deficiency ridge.
"""
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from orcvio_tpu.filter.pipeline import run_sequence
from orcvio_tpu.filter.update import apply_ekf_update

pytestmark = pytest.mark.slow  # >60 s e2e module; deselect with -m 'not slow'

CFG_KW = dict(sw_size=8, max_features=60, max_track_len=6, imu_slab=12,
              observation_noise=0.004, tri_translation_threshold=-1.0,
              update_form="qr")
SIM_KW = dict(n_frames=50, n_landmarks=250, max_obs=40, imu_slab=12, seed=2)


class TestUpdateForms:
    def test_single_update_equivalence_rank_deficient(self):
        cfg, st, frames, chi2 = ge._build(CFG_KW, SIM_KW, jnp.float64)
        D = st.P.shape[0]
        rng = np.random.default_rng(0)
        # correlated PSD covariance
        A = rng.normal(size=(D, D)) * 0.02
        P = A @ A.T + 1e-4 * np.eye(D)
        st = st.replace(P=jnp.asarray(P))
        # rank-deficient stack: 40 rows from only 8 independent directions
        B = rng.normal(size=(8, D))
        C = rng.normal(size=(40, 8))
        H = jnp.asarray(C @ B)
        r = jnp.asarray(rng.normal(size=40) * 0.01)

        st_qr, dx_qr = apply_ekf_update(cfg, st, H, r)
        cfg_inf = replace(cfg, update_form="information")
        st_in, dx_in = apply_ekf_update(cfg_inf, st, H, r)
        # inversion-lemma form is exact (no ridge, no factorization of the
        # rank-deficient Lambda); agreement to solver roundoff
        assert np.abs(np.asarray(dx_in) - np.asarray(dx_qr)).max() < 1e-10
        dP = np.linalg.norm(np.asarray(st_in.P) - np.asarray(st_qr.P))
        assert dP / np.linalg.norm(np.asarray(st_qr.P)) < 1e-8, dP

    def test_e2e_equivalence(self):
        cfg, st, frames, chi2 = ge._build(CFG_KW, SIM_KW, jnp.float64)
        cfg_inf = replace(cfg, update_form="information")
        _, outs_qr = jax.jit(lambda s, f: run_sequence(cfg, s, f, chi2))(st, frames)
        _, outs_in = jax.jit(
            lambda s, f: run_sequence(cfg_inf, s, f, chi2))(st, frames)
        d = np.linalg.norm(np.asarray(outs_in.p) - np.asarray(outs_qr.p), axis=1)
        assert d.max() < 1e-4, d.max()

    def test_single_update_direct_equals_qr(self):
        """'direct' (no compression) must equal the QR-compressed update —
        zero rows decouple in S and compression is information-preserving."""
        cfg, st, frames, chi2 = ge._build(CFG_KW, SIM_KW, jnp.float64)
        D = st.P.shape[0]
        rng = np.random.default_rng(3)
        A = rng.normal(size=(D, D)) * 0.02
        P = A @ A.T + 1e-4 * np.eye(D)
        st = st.replace(P=jnp.asarray(P))
        B = rng.normal(size=(8, D))
        C = rng.normal(size=(40, 8))
        H = jnp.asarray(C @ B)
        # zero (padded) rows interleaved, as the masked stack produces
        H = H.at[::3].set(0.0)
        r = jnp.asarray(rng.normal(size=40) * 0.01)
        r = r.at[::3].set(0.0)
        st_qr, dx_qr = apply_ekf_update(cfg, st, H, r)
        cfg_dir = replace(cfg, update_form="direct")
        st_d, dx_d = apply_ekf_update(cfg_dir, st, H, r)
        assert np.abs(np.asarray(dx_d) - np.asarray(dx_qr)).max() < 1e-10
        dP = np.linalg.norm(np.asarray(st_d.P) - np.asarray(st_qr.P))
        assert dP / np.linalg.norm(np.asarray(st_qr.P)) < 1e-8, dP

    def test_e2e_direct_equals_qr(self):
        cfg, st, frames, chi2 = ge._build(CFG_KW, SIM_KW, jnp.float64)
        cfg_dir = replace(cfg, update_form="direct")
        _, outs_qr = jax.jit(lambda s, f: run_sequence(cfg, s, f, chi2))(st, frames)
        _, outs_d = jax.jit(
            lambda s, f: run_sequence(cfg_dir, s, f, chi2))(st, frames)
        d = np.linalg.norm(np.asarray(outs_d.p) - np.asarray(outs_qr.p), axis=1)
        assert d.max() < 1e-6, d.max()


def test_joseph_form_matches_and_psd():
    """Joseph-form P <- (I-KH) P (I-KH)^T + sigma^2 K K^T equals the
    economical (I-KH)P form in exact arithmetic and is PSD-preserving by
    construction (the long-f32-horizon divergence fix, config joseph_form)."""
    cfg, st, frames, chi2 = ge._build(CFG_KW, SIM_KW, jnp.float64)
    D = st.P.shape[0]
    rng = np.random.default_rng(7)
    A = rng.normal(size=(D, D)) * 0.02
    P = A @ A.T + 1e-4 * np.eye(D)
    st = st.replace(P=jnp.asarray(P))
    B = rng.normal(size=(8, D))
    C = rng.normal(size=(40, 8))
    H = jnp.asarray(C @ B)
    r = jnp.asarray(rng.normal(size=40) * 0.01)
    cfg_dir = replace(cfg, update_form="direct")
    st_e, dx_e = apply_ekf_update(cfg_dir, st, H, r)
    cfg_j = replace(cfg, update_form="direct", joseph_form=True)
    st_j, dx_j = apply_ekf_update(cfg_j, st, H, r)
    np.testing.assert_allclose(np.asarray(dx_j), np.asarray(dx_e), atol=1e-10)
    dP = np.linalg.norm(np.asarray(st_j.P) - np.asarray(st_e.P))
    assert dP / np.linalg.norm(np.asarray(st_e.P)) < 1e-8, dP
    ev = np.linalg.eigvalsh(np.asarray(st_j.P))
    assert ev.min() > -1e-12, ev.min()
