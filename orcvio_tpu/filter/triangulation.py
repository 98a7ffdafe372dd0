"""Batched feature triangulation: two-view init + masked fixed-iteration LM.

TPU-native equivalent of the per-feature triangulation in
``include/orcvio/feat/feature.hpp`` (generateInitialGuess :331, checkMotion
:353, triangulate_position :583, cost :271, jacobian :293): one batched
computation over compacted tracks (see tracks.py), with per-observation masks
instead of dynamic observation lists and a fixed-iteration damped Gauss-Newton
loop with accept/reject masking instead of the reference's nested adaptive
loops (inner/outer are capped at 10 there anyway; we run a fixed budget of
damped steps with per-feature lambda adaptation — same fixed point,
jit-friendly).

Parametrization matches the reference: anchor frame = newest observed clone;
solve for (alpha, beta, rho) = (x/z, y/z, 1/z) in the anchor camera frame.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from .tracks import CompactTracks


class TriResult(NamedTuple):
    p_anchor: jnp.ndarray  # (F, 3) position in anchor cam frame
    p_world: jnp.ndarray  # (F, 3)
    anchor_slot: jnp.ndarray  # (F,) int32 clone slot of the anchor
    valid: jnp.ndarray  # (F,) bool
    inv_param: jnp.ndarray  # (F, 3) (alpha, beta, rho) in anchor frame


def _gathered_cams(ct: CompactTracks, R_c2w, t_c_w):
    return R_c2w[ct.slot], t_c_w[ct.slot]  # (F, T, 3, 3), (F, T, 3)


def _anchor_index(ct: CompactTracks):
    """Index (into the compact axis) of the newest valid obs."""
    return jnp.maximum(ct.n_obs - 1, 0)


def check_motion(ct: CompactTracks, R_c2w, t_c_w, threshold):
    """Parallax check. Ref: Feature::checkMotion (feature.hpp:353).

    threshold < 0 disables (euroc.yaml: feature_translation_threshold: -1).
    """
    Rg, tg = _gathered_cams(ct, R_c2w, t_c_w)
    a = _anchor_index(ct)
    z0 = ct.uv[:, 0]  # oldest obs
    dir0 = jnp.concatenate([z0, jnp.ones_like(z0[:, :1])], axis=1)
    dir0 = dir0 / jnp.linalg.norm(dir0, axis=1, keepdims=True)
    dir_w = jnp.einsum("fij,fj->fi", Rg[:, 0], dir0)
    t_last = jnp.take_along_axis(tg, a[:, None, None], axis=1)[:, 0]
    trans = t_last - tg[:, 0]
    par = jnp.sum(trans * dir_w, axis=1)
    ortho = trans - par[:, None] * dir_w
    return (jnp.linalg.norm(ortho, axis=1) > threshold) | (threshold < 0)


def triangulate(cfg: FilterConfig, ct: CompactTracks, R_c2w, t_c_w,
                p_init_world=None) -> TriResult:
    """Triangulate every feature row. Ref: Feature::triangulate_position (feature.hpp:583).

    p_init_world (F, 3), optional: a world-frame prior point per feature
    (e.g. the bbox-derived object center for semantic keypoints). When given
    and finite, its anchor-frame depth replaces the two-view initial depth —
    the two-view guess degenerates to 1 m under near-parallel rays or
    identity-swapped tracks, and the LM then converges to a collapsed
    depth~0 minimum.
    """
    F, T, _ = ct.uv.shape
    dtype = ct.uv.dtype
    Rg, tg = _gathered_cams(ct, R_c2w, t_c_w)
    a = _anchor_index(ct)
    R_a = jnp.take_along_axis(Rg, a[:, None, None, None], axis=1)[:, 0]  # (F, 3, 3)
    t_a = jnp.take_along_axis(tg, a[:, None, None], axis=1)[:, 0]  # (F, 3)

    # Relative poses anchor -> camera_t. Ref: pose.inverse() * T_c_w_last.
    R_rel = jnp.einsum("ftji,fjk->ftik", Rg, R_a)  # (F, T, 3, 3)
    t_rel = jnp.einsum("ftji,ftj->fti", Rg, t_a[:, None, :] - tg)

    # --- two-view initial guess in the anchor frame (feature.hpp:331) ---
    z_anchor = jnp.take_along_axis(ct.uv, a[:, None, None], axis=1)[:, 0]
    z_first = ct.uv[:, 0]
    R_fa = R_rel[:, 0]
    t_fa = t_rel[:, 0]
    m = jnp.einsum("fij,fj->fi", R_fa, jnp.concatenate([z_anchor, jnp.ones_like(z_anchor[:, :1])], 1))
    A0 = m[:, 0] - z_first[:, 0] * m[:, 2]
    A1 = m[:, 1] - z_first[:, 1] * m[:, 2]
    b0 = z_first[:, 0] * t_fa[:, 2] - t_fa[:, 0]
    b1 = z_first[:, 1] * t_fa[:, 2] - t_fa[:, 1]
    denom = A0 * A0 + A1 * A1
    depth = jnp.where(denom > 1e-12, (A0 * b0 + A1 * b1) / jnp.maximum(denom, 1e-12), 1.0)
    depth = jnp.clip(depth, 0.1, 1e3)
    if p_init_world is not None:
        h_a = jnp.einsum("fji,fj->fi", R_a, p_init_world - t_a)  # anchor frame
        prior_ok = jnp.all(jnp.isfinite(p_init_world), axis=1) & (h_a[:, 2] > 0.2)
        depth = jnp.where(prior_ok, jnp.clip(h_a[:, 2], 0.2, 1e3), depth)
    x0 = jnp.stack([z_anchor[:, 0], z_anchor[:, 1], 1.0 / depth], axis=1)

    # --- damped Gauss-Newton with accept/reject (LM) ---
    # TPU-shaped: one residual evaluation per iteration (the candidate's
    # residual is carried and reused when the step is accepted) and a
    # closed-form 3x3 Cramer solve instead of a batched LU custom call.
    W = jnp.concatenate([R_rel[..., :2], t_rel[..., None]], axis=-1)  # (F, T, 3, 3)

    def residuals(x):
        ab1 = jnp.concatenate([x[:, :2], jnp.ones_like(x[:, :1])], axis=1)
        h = jnp.einsum("ftij,fj->fti", R_rel, ab1) + x[:, 2:3, None] * t_rel
        z_hat = h[..., :2] / h[..., 2:3]
        r = z_hat - ct.uv
        return h, jnp.where(ct.mask[..., None], r, 0.0)

    def solve3(A, b):
        """Batched 3x3 Cramer solve (pure elementwise — no LU custom call)."""
        c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
        c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
        c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
        det = A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02
        det = jnp.where(jnp.abs(det) > 1e-18, det, 1e-18)
        adj = jnp.stack(
            [
                jnp.stack([c00, A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2],
                           A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]], -1),
                jnp.stack([c01, A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0],
                           A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]], -1),
                jnp.stack([c02, A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1],
                           A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]], -1),
            ],
            axis=-2,
        )
        return jnp.einsum("...ij,...j->...i", adj, b) / det[..., None]

    huber = cfg.huber_epsilon

    def lm_step(carry, _):
        x, lam, cost, h, r = carry
        h3 = h[..., 2:3]
        J = W[..., :2, :] / h3[..., None] - (h[..., :2, None] * W[..., 2:3, :]) / (h3[..., None] ** 2)
        J = jnp.where(ct.mask[..., None, None], J, 0.0)
        e = jnp.linalg.norm(r, axis=-1)
        w2 = jnp.where(e <= huber, 1.0, 2.0 * huber / jnp.maximum(e, 1e-12))
        Jw = J * w2[..., None, None]
        A = jnp.einsum("ftik,ftil->fkl", Jw, J)
        b = jnp.einsum("ftik,fti->fk", Jw, r)
        A = A + lam[:, None, None] * jnp.eye(3, dtype=x.dtype)
        delta = solve3(A, b)
        x_new = x - delta
        h_new, r_new = residuals(x_new)
        cost_new = jnp.sum(r_new * r_new, axis=(1, 2))
        accept = cost_new < cost
        x = jnp.where(accept[:, None], x_new, x)
        cost = jnp.where(accept, cost_new, cost)
        h = jnp.where(accept[:, None, None], h_new, h)
        r = jnp.where(accept[:, None, None], r_new, r)
        lam = jnp.where(accept, jnp.maximum(lam / 10, 1e-10), jnp.minimum(lam * 10, 1e12))
        return (x, lam, cost, h, r), None

    lam0 = jnp.full((F,), cfg.tri_initial_damping, dtype)
    h0, r0 = residuals(x0)
    cost0 = jnp.sum(r0 * r0, axis=(1, 2))
    (x, lam, cost, _, _), _ = jax.lax.scan(
        lm_step, (x0, lam0, cost0, h0, r0), None, length=cfg.tri_max_iters,
        unroll=True,  # small fused body; loop sync overhead dominates
    )

    # --- validity checks (feature.hpp:688-720) ---
    rho_safe = jnp.where(jnp.abs(x[:, 2]) > 1e-8, x[:, 2], 1e-8)
    p_anchor = jnp.stack([x[:, 0] / rho_safe, x[:, 1] / rho_safe, 1.0 / rho_safe], axis=1)
    h, _ = residuals(x)
    depth_all = jnp.where(ct.mask, h[..., 2] / rho_safe[:, None], 1.0)
    pos_depth = jnp.all(depth_all > 0, axis=1) & (x[:, 2] > 0)
    n_obs = ct.n_obs
    normalized_cost = cost / jnp.maximum(2.0 * n_obs * n_obs, 1.0)
    cost_ok = normalized_cost < 4.7673e-4  # cost_threshold (feature.hpp:58)
    p0 = jnp.stack([x0[:, 0] / x0[:, 2], x0[:, 1] / x0[:, 2], 1.0 / x0[:, 2]], axis=1)
    dist_ok = jnp.linalg.norm(p_anchor - p0, axis=1) < 5.0  # init_final_dist_threshold
    valid = pos_depth & cost_ok & dist_ok & (n_obs >= 2)

    p_world = jnp.einsum("fij,fj->fi", R_a, p_anchor) + t_a
    anchor_slot = jnp.take_along_axis(ct.slot, a[:, None], axis=1)[:, 0]
    return TriResult(p_anchor=p_anchor, p_world=p_world, anchor_slot=anchor_slot, valid=valid, inv_param=x)
