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

    For small k (the MSCKF case, k = 3) the k Householder reflections are
    unrolled inline instead of calling the TPU QrDecompositionBlock custom
    call: the batched custom call + explicit complete-Q formation measured
    ~0.3 ms/frame in the filter scan, while k reflections applied directly to
    [H_x | r] are a handful of fused elementwise ops. The output differs from
    the QR-basis version only by an orthogonal row transform (per-row signs /
    basis choice), which every consumer (S, chi-square, EKF update) is
    invariant to.
    """
    m, k = H_f.shape
    if k > 8:  # large blocks: the custom call wins on op count
        Q, _ = jnp.linalg.qr(H_f, mode="complete")  # (m, m)
        A = Q[:, k:]  # (m, m-k) left-nullspace basis
        H_x_p = A.T @ H_x
        r_p = A.T @ r
        pad = ((0, k),) + ((0, 0),) * (H_x_p.ndim - 1)
        H_x_out = jnp.pad(H_x_p, pad)
        r_out = jnp.pad(r_p, ((0, k),))
        return H_x_out, r_out

    M = jnp.concatenate([H_x, r[:, None]], axis=1)  # (m, d+1)
    A = H_f
    rows = jnp.arange(m)
    for j in range(k):
        x = jnp.where(rows >= j, A[:, j], 0.0)
        nx = jnp.sqrt(jnp.sum(x * x))
        sign = jnp.where(x[j] >= 0, 1.0, -1.0).astype(x.dtype)
        v = x.at[j].add(sign * nx)  # v = x - (-sign*||x||) e_j
        vtv = jnp.sum(v * v)
        beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)
        A = A - (beta * v)[:, None] * (v @ A)[None, :]
        M = M - (beta * v)[:, None] * (v @ M)[None, :]
    # rows k..m-1 of Q^T [H_x | r] are the left-nullspace projection; shift
    # them up and zero the last k rows (same layout as the QR branch)
    keep = rows < (m - k)
    Hp = jnp.where(keep[:, None], jnp.roll(M[:, :-1], -k, axis=0), 0.0)
    rp = jnp.where(keep, jnp.roll(M[:, -1], -k), 0.0)
    return Hp, rp


def chi2_gamma(S, r):
    """gamma = r^T S^{-1} r for small PD S, via unrolled bordered elimination.

    S: (..., m, m) PD (S = H P H^T + sigma^2 I — masked rows are sigma^2 e_k),
    r: (..., m). The TPU Cholesky custom call on (F, m, m) tiles measured
    ~0.6 ms/frame at m = 12 in the filter scan; m steps of symmetric Gaussian
    elimination on the bordered matrix [[S, r], [r^T, 0]] are ~2 fused ops per
    step and batch over any leading dims. After eliminating all m pivots the
    border entry holds -r^T S^{-1} r exactly. Non-positive pivots (impossible
    for true PD S, possible under f32 roundoff blowups) return +inf so the
    chi-square gate rejects, matching the NaN-propagation behavior of the
    Cholesky path.
    """
    m = S.shape[-1]
    border = jnp.concatenate([r[..., None, :], jnp.zeros_like(r[..., :1])[..., None]], axis=-1)
    T = jnp.concatenate([
        jnp.concatenate([S, r[..., :, None]], axis=-1),
        border,
    ], axis=-2)  # (..., m+1, m+1)
    ok = jnp.ones(S.shape[:-2], bool)
    for k_ in range(m):
        d = T[..., k_, k_]
        ok = ok & (d > 0)
        c = T[..., :, k_]
        T = T - c[..., :, None] * (c[..., None, :] / jnp.where(d > 0, d, 1.0)[..., None, None])
    gamma = -T[..., m, m]
    return jnp.where(ok, gamma, jnp.inf)


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


def chol_compress(H, r):
    """Gram-Cholesky compression: the MXU-native equivalent of qr_compress.

    Returns (H_thin, r_thin) with H_thin^T H_thin == H^T H and
    H_thin^T r_thin == H^T r (the only contracts the EKF update consumes —
    same invariants tests pin for qr_compress). For full column rank,
    H_thin = chol(H^T H)^T equals the QR's R factor up to row signs, so the
    downstream S = H_thin P H_thin^T + sigma^2 I solve is numerically
    identical; the tall blocked-Householder QR custom call (~0.9 ms/frame at
    (384, 142) batch 16, measured) is replaced by one Gram matmul + one D x D
    Cholesky + one triangular solve.

    Exactly-zero columns of H (clone slots with no stacked observation — the
    common rank deficiency under static-shape padding) are decoupled by
    adding an identity diagonal entry, which makes the corresponding L
    row/column exactly e_k; those rows are zeroed in the output so they carry
    no fake information: L L^T - sum_k e_k e_k^T == H^T H exactly.
    """
    import jax.scipy.linalg as jsl

    Lam = H.T @ H
    b = H.T @ r
    zero_col = jnp.diagonal(Lam) <= 0.0
    L = jnp.linalg.cholesky(Lam + jnp.diag(zero_col.astype(H.dtype)))
    r_thin = jsl.solve_triangular(L, b, lower=True)
    H_thin = jnp.where(zero_col[:, None], 0.0, L.T)
    r_thin = jnp.where(zero_col, 0.0, r_thin)
    return H_thin, r_thin


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
