"""SO(3) operations, batched and jit-safe.

TPU-native equivalents of the reference math layer
(``include/orcvio/utils/math_utils.hpp:27`` skewSymmetric,
``math_utils.hpp:230`` Hl_operator, ``math_utils.hpp:251`` Jl_operator), redesigned as
dtype-polymorphic batched jnp functions with Taylor-safe small-angle branches (the
reference uses a ``norm < 1e-5`` runtime ``if``; here both branches are computed and
selected with ``jnp.where``, with the "safe theta" pattern so values AND gradients
are finite at theta = 0 — required for the autodiff-verified Jacobian tests).

All functions accept arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-5
_SMALL2 = _SMALL * _SMALL


def hat(w):
    """Skew-symmetric matrix from (..., 3) vector. Ref: math_utils.hpp:27."""
    w = jnp.asarray(w)
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_theta(w):
    """(theta, small_mask) with gradients finite at w = 0.

    theta equals |w| wherever |w| >= _SMALL; on the small branch it is a dummy
    1.0 (the Taylor series uses t2 directly, which is smooth).
    """
    t2 = jnp.sum(w * w, axis=-1)
    small = t2 < _SMALL2
    theta = jnp.sqrt(jnp.where(small, 1.0, t2))
    return t2, theta, small


def _coeff_a(t2, theta, small):
    """sin(t)/t."""
    return jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(theta) / theta)


def _coeff_b(t2, theta, small):
    """(1 - cos(t)) / t^2."""
    return jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0, (1.0 - jnp.cos(theta)) / t2_or(theta))


def _coeff_c(t2, theta, small):
    """(t - sin(t)) / t^3."""
    return jnp.where(
        small,
        1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
        (theta - jnp.sin(theta)) / (theta * t2_or(theta)),
    )


def _coeff_d(t2, theta, small):
    """(2(cos t - 1) + t^2) / (2 t^4) — the Hl W^2 coefficient. Ref: math_utils.hpp:230."""
    t2s = t2_or(theta)
    return jnp.where(
        small,
        1.0 / 24.0 - t2 / 720.0 + t2 * t2 / 40320.0,
        (2.0 * (jnp.cos(theta) - 1.0) + t2s) / (2.0 * t2s * t2s),
    )


def t2_or(theta):
    return theta * theta


def exp(w):
    """Matrix exponential on SO(3) (Rodrigues), (..., 3) -> (..., 3, 3)."""
    w = jnp.asarray(w)
    t2, theta, small = _safe_theta(w)
    W = hat(w)
    W2 = W @ W
    a = _coeff_a(t2, theta, small)[..., None, None]
    b = _coeff_b(t2, theta, small)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log(R):
    """Logarithm map SO(3) -> so(3), (..., 3, 3) -> (..., 3).

    Robust near theta = 0 (Taylor on the skew part) and theta = pi (axis from
    the dominant column of R + I). Returns |w| <= pi.
    """
    R = jnp.asarray(R)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_raw = (tr - 1.0) * 0.5
    # clip strictly inside (-1, 1) in THIS dtype: at exactly +-1 arccos has an
    # infinite derivative that poisons autodiff through the untaken branch of
    # the jnp.where below; 4*eps stays representable next to 1 in f32 and f64
    eps = float(jnp.finfo(R.dtype).eps)
    theta = jnp.arccos(jnp.clip(cos_raw, -1.0 + 4 * eps, 1.0 - 4 * eps))
    sin_t = jnp.sin(theta)
    v = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    # dtype-aware small-angle gate on the UNCLIPPED cosine: f32 products of
    # rotations drift to tr slightly > 3, where fixed 1e-12/1e-9 thresholds
    # round to 1.0f and the generic branch hits 0/0 (theta/sin both 0)
    small = cos_raw > 1.0 - max(1e-9, 1e4 * eps)  # theta < ~4.5e-5 (f64) / ~5e-2 (f32)
    near_pi = theta > (jnp.pi - 1e-3)
    # Generic: theta / (2 sin theta) * v
    safe_sin = jnp.where(small | near_pi, 1.0, sin_t)
    w_generic = (theta / (2.0 * safe_sin))[..., None] * v
    # Small: 0.5 (1 + s2/6) v with s2 = |v|^2/4 ~= theta^2 (smooth in R)
    s2 = 0.25 * jnp.sum(v * v, axis=-1)
    w_small = (0.5 * (1.0 + s2 / 6.0))[..., None] * v
    # Near pi: axis from largest column of A = R + I (A = 2 axis axis^T at pi)
    A = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    k = jnp.argmax(jnp.linalg.norm(A, axis=-2), axis=-1)
    axis = jnp.take_along_axis(A, k[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    sign = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign
    out = jnp.where(small[..., None], w_small, w_generic)
    return jnp.where(near_pi[..., None], w_pi, out)


def left_jacobian(w):
    """SO(3) left Jacobian Jl. Ref: math_utils.hpp:251 (Jl_operator).

    Jl(w) = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2, W = hat(w).
    """
    w = jnp.asarray(w)
    t2, theta, small = _safe_theta(w)
    W = hat(w)
    W2 = W @ W
    b = _coeff_b(t2, theta, small)[..., None, None]
    c = _coeff_c(t2, theta, small)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def Hl(w):
    """The Hl operator used in closed-form position propagation. Ref: math_utils.hpp:230.

    Hl(w) = 0.5 I + (t - sin t)/t^3 W + (2(cos t - 1) + t^2)/(2 t^4) W^2.
    Identity: Hl(w) = \\int_0^1 s Jl(s w) ds (verified in tests).
    """
    w = jnp.asarray(w)
    t2, theta, small = _safe_theta(w)
    W = hat(w)
    W2 = W @ W
    c = _coeff_c(t2, theta, small)[..., None, None]
    d = _coeff_d(t2, theta, small)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return 0.5 * eye + c * W + d * W2


def left_jacobian_inv(w):
    """Inverse of the SO(3) left Jacobian (closed form)."""
    w = jnp.asarray(w)
    t2, theta, small = _safe_theta(w)
    W = hat(w)
    W2 = W @ W
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / t2_or(theta) - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2
