"""Pallas kernel tests: fused covariance update vs the XLA formulation
(interpret mode on CPU; the real kernel runs in bench/TPU paths)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.ops.cov_update import cov_update_pallas, cov_update_reference

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("D,q", [(142, 96), (190, 384), (128, 128), (50, 20)])
def test_matches_reference(D, q):
    A = RNG.normal(size=(D, D)).astype(np.float32)
    P = jnp.asarray(A @ A.T / D)
    K = jnp.asarray(RNG.normal(size=(D, q)).astype(np.float32) * 0.1)
    H = jnp.asarray(RNG.normal(size=(q, D)).astype(np.float32) * 0.1)
    out = cov_update_pallas(P, K, H, interpret=True)
    ref = cov_update_reference(P, K, H)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4), (
        np.abs(np.asarray(out) - np.asarray(ref)).max()
    )
    # exactly symmetric by construction
    assert np.allclose(np.asarray(out), np.asarray(out).T, atol=0)
