"""Batched 8-point fundamental-matrix RANSAC.

TPU-native equivalent of the reference's cv::findFundamentalMat RANSAC gate
(image_processor.cpp:508,743-767): instead of a sequential hypothesize-verify
loop, all H hypotheses are solved simultaneously (batched SVD of H x 8 x 9
design matrices on the MXU) and scored against all correspondences at once;
the best model's inliers form the gate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _eight_point(p1, p2):
    """F from 8 normalized correspondences per hypothesis.

    p1, p2: (Hyp, 8, 2) -> F (Hyp, 3, 3). Hartley normalization is implicit:
    inputs are already camera-normalized coordinates (O(1) scale).
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1)
    # Null vector of A via fixed-count inverse iteration on A^T A + eps I.
    # TPU's jnp.linalg.svd lowers to data-dependent while loops (hundreds of
    # microseconds per call at these tiny batched shapes), and lu_factor is
    # a custom call with the same problem; 8 exact equations make A^T A
    # singular up to roundoff, so 3 ridge-regularized solves through an
    # UNROLLED batched 9x9 Cholesky (pure vectorized arithmetic, static
    # shapes, no pivots) recover the null direction to working precision.
    # The rank-2 projection of the classic 8-point algorithm is skipped:
    # hypotheses are only scored by Sampson distance, for which the
    # unprojected F gates equally (tests assert inlier-recovery parity).
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    eps = 1e-7 * jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    M = AtA + eps * jnp.eye(9, dtype=A.dtype)
    L = _cholesky9(M)
    v = jnp.ones((A.shape[0], 9), A.dtype)
    for _ in range(3):
        v = _chol_solve(L, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v.reshape(A.shape[0], 3, 3)


def _cholesky9(M):
    """Unrolled batched Cholesky of (H, 9, 9) SPD matrices (no custom call)."""
    n = M.shape[-1]
    L = jnp.zeros_like(M)
    for j in range(n):
        s = M[:, j, j] - jnp.sum(L[:, j, :j] ** 2, axis=-1) if j else M[:, j, j]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        col = (M[:, :, j]
               - (jnp.einsum("hk,hjk->hj", L[:, j, :j], L[:, :, :j]) if j else 0.0)
               ) / d[:, None]
        row = jnp.arange(n)
        L = L + jnp.where((row >= j)[None, :, None] & (row == j)[None, None, :],
                          col[:, :, None], 0.0)
    return L


def _chol_solve(L, b):
    """Solve L L^T x = b by unrolled forward/back substitution. b: (H, n)."""
    n = L.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(n):
        yi = (b[:, i] - jnp.sum(L[:, i, :i] * y[:, :i], axis=-1)) / L[:, i, i]
        y = y.at[:, i].set(yi)
    x = jnp.zeros_like(b)
    for i in range(n - 1, -1, -1):
        xi = (y[:, i] - jnp.sum(L[:, i + 1:, i] * x[:, i + 1:], axis=-1)) / L[:, i, i]
        x = x.at[:, i].set(xi)
    return x


def sampson_dist(F, p1, p2):
    """Sampson distance per correspondence: F (..., 3, 3), p (N, 2)."""
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)  # (N, 3)
    p2h = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    Fx1 = jnp.einsum("...ij,nj->...ni", F, p1h)  # (..., N, 3)
    Ftx2 = jnp.einsum("...ji,nj->...ni", F, p2h)
    x2Fx1 = jnp.einsum("ni,...ni->...n", p2h, Fx1)
    denom = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return (x2Fx1**2) / jnp.maximum(denom, 1e-12)


def ransac_fundamental(p1, p2, valid, key, n_hyp: int = 128, thresh: float = 3e-5):
    """Inlier mask via batched 8-point RANSAC.

    p1, p2: (N, 2) normalized coords; valid: (N,) candidate mask; thresh is
    squared Sampson distance in normalized coords (the reference uses 1 px at
    ~460 focal -> (1/460)^2 ~ 4.7e-6; default is looser). Returns (inliers,
    best_F).
    """
    N = p1.shape[0]
    n_valid = jnp.sum(valid)
    # sample valid indices: weighted categorical without replacement-ish
    # (collisions are acceptable for hypothesis sampling)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 8))
    F = _eight_point(p1[idx], p2[idx])  # (Hyp, 3, 3)
    d = sampson_dist(F, p1, p2)  # (Hyp, N)
    inl = (d < thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    inliers = inl[best]
    # degenerate cases: too few points to vote -> keep all valid
    enough = n_valid >= 12
    return jnp.where(enough, inliers, valid), F[best]
