"""Dense linear-algebra helpers for the filter, batched + masked.

TPU-native replacements for the reference's per-feature Eigen calls:
``nullspace_project_inplace_svd/qr`` (``math_utils.hpp:287,315``), the SPQR QR
compression (``src/orcvio.cpp:1664-1683``), and the boost chi-square table
(``src/orcvio.cpp:486-494``). Designed around static shapes: padded (masked-out)
rows are exact zero rows, which are harmless through Householder QR and through
S = H P H^T + sigma^2 I solves (they produce decoupled identity rows).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_CHI2_MAX_DOF = 500


def chi_squared_table(confidence=0.95, max_dof=_CHI2_MAX_DOF):
    """chi^2 inverse-CDF lookup, index = dof (0 unused). Ref: orcvio.cpp:486-494.

    Computed host-side with scipy at setup time and baked in as a constant array
    (the reference builds the same table once at init with boost::math).
    """
    from scipy.stats import chi2

    table = np.zeros(max_dof + 1)
    table[1:] = chi2.ppf(confidence, np.arange(1, max_dof + 1))
    return jnp.asarray(table)


def nullspace_project(H_f, H_x, r):
    """Project (H_x, r) onto the left nullspace of H_f. Ref: math_utils.hpp:315.

    H_f: (m, k), H_x: (m, d), r: (m,). Returns (H_x', r') with m - k meaningful
    rows, padded back to m rows with zeros so shapes stay static. Zero (masked)
    rows of H_f contribute pure nullspace directions whose projections of the
    (equally zeroed) H_x/r rows are zero — so padding is exact, not approximate.
    """
    m, k = H_f.shape
    Q, _ = jnp.linalg.qr(H_f, mode="complete")  # (m, m)
    A = Q[:, k:]  # (m, m-k) left-nullspace basis
    H_x_p = A.T @ H_x
    r_p = A.T @ r
    pad = ((0, k),) + ((0, 0),) * (H_x_p.ndim - 1)
    H_x_out = jnp.pad(H_x_p, pad)
    r_out = jnp.pad(r_p, ((0, k),))
    return H_x_out, r_out


def qr_compress(H, r, out_rows=None):
    """Compress a tall stacked Jacobian via thin QR. Ref: orcvio.cpp:1664-1683 (SPQR).

    H: (m, d), r: (m,). Returns (R, Q1^T r) with shapes ((q, d), (q,)) where
    q = min(m, d) by default (dense, static) — the TPU-native stand-in for
    sparse SPQR: at these sizes (m <= few thousand, d <= few hundred) dense
    Householder on the MXU wins.
    """
    m, d = H.shape
    q = min(m, d) if out_rows is None else out_rows
    Q, R = jnp.linalg.qr(H, mode="reduced")
    r_c = Q.T @ r
    return R[:q], r_c[:q]


def symmetrize(P):
    """(P + P^T)/2 — the reference re-symmetrizes after every covariance op."""
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def masked_psd_solve(S, B, row_mask, reg=0.0):
    """Solve S X = B where masked rows/cols of S are replaced by identity.

    S: (..., m, m); B: (..., m, n) or (..., m); row_mask: (..., m) bool/0-1.
    Masked rows of the solution are zero provided the matching B rows are zero.
    Keeps Cholesky well-posed with static shapes.
    """
    import jax.scipy.linalg as jsl

    m = S.shape[-1]
    mask = row_mask.astype(S.dtype)
    outer = mask[..., :, None] * mask[..., None, :]
    eye = jnp.eye(m, dtype=S.dtype)
    # masked rows/cols -> identity rows (decoupled), masked-in block untouched
    S_m = S * outer + (1.0 - outer) * eye + reg * eye
    L = jnp.linalg.cholesky(S_m)
    vector_rhs = B.ndim == S.ndim - 1
    if vector_rhs:
        B = B[..., None]
    X = jsl.cho_solve((L, True), B)
    X = X * mask[..., :, None]
    return X[..., 0] if vector_rhs else X
