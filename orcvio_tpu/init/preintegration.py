"""IMU preintegration between camera frames (midpoint rule).

TPU-native equivalent of ``include/Initializer/ImuPreintegration.h:81``
(VINS-Mono-style midpoint preintegration): per frame-gap factors
(delta_p alpha, delta_v beta, delta_R gamma) with the gyro-bias Jacobian
needed by visual-inertial alignment — computed as one ``lax.scan`` over the
frame's padded IMU slab, batched over frame gaps with ``vmap``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import so3


class Preintegration(NamedTuple):
    dR: jnp.ndarray  # (..., 3, 3) body_k -> body_{k+1} rotation (R_k^T R_{k+1})
    dv: jnp.ndarray  # (..., 3) velocity delta in body_k frame
    dp: jnp.ndarray  # (..., 3) position delta in body_k frame
    dt: jnp.ndarray  # (...,) total integrated time
    J_q_bg: jnp.ndarray  # (..., 3, 3) d(log dR)/d(gyro bias)
    J_v_bg: jnp.ndarray  # (..., 3, 3)
    J_p_bg: jnp.ndarray  # (..., 3, 3)


def preintegrate(imu_t, gyro, acc, mask, bg, ba):
    """Preintegrate one frame gap. imu_t/gyro/acc: (S, ...), mask: (S,).

    Midpoint scheme over consecutive samples (ImuPreintegration.h:81):
    the first sample provides the left endpoint only.
    """
    dtype = gyro.dtype
    S = imu_t.shape[0]

    def step(carry, inp):
        R, v, p, Jq, Jv, Jp, t_prev, g_prev, a_prev, started = carry
        t_i, g_i, a_i, m_i = inp
        dt = jnp.where(started & m_i, t_i - t_prev, 0.0)
        g_mid = 0.5 * (g_prev + g_i) - bg
        a0 = a_prev - ba
        a1 = a_i - ba
        dR_step = so3.exp(g_mid * dt)
        R_new = R @ dR_step
        a_mid = 0.5 * (jnp.einsum("ij,j->i", R, a0) + jnp.einsum("ij,j->i", R_new, a1))
        v_new = v + a_mid * dt
        p_new = p + v * dt + 0.5 * a_mid * dt * dt
        # bias Jacobians (first-order, VINS midpoint approximation)
        Jr = so3.left_jacobian(-g_mid * dt)  # right Jacobian of exp
        Jq_new = jnp.einsum("ij,jk->ik", dR_step.T, Jq) - Jr * dt
        # dv/dbg: d(R a_mid dt)/dbg ~ -R hat(a) Jq dt ; dv/dba handled at solve
        Jv_new = Jv - jnp.einsum("ij,jk,kl->il", R, so3.hat(a0), Jq) * dt
        Jp_new = Jp + Jv * dt - 0.5 * jnp.einsum("ij,jk,kl->il", R, so3.hat(a0), Jq) * dt * dt
        upd = started & m_i
        sel = lambda a, b: jnp.where(upd, a, b)
        carry2 = (
            sel(R_new, R), sel(v_new, v), sel(p_new, p),
            sel(Jq_new, Jq), sel(Jv_new, Jv), sel(Jp_new, Jp),
            jnp.where(m_i, t_i, t_prev),
            jnp.where(m_i, g_i, g_prev),
            jnp.where(m_i, a_i, a_prev),
            started | m_i,
        )
        return carry2, dt

    init = (
        jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype),
        jnp.zeros((3, 3), dtype), jnp.zeros((3, 3), dtype), jnp.zeros((3, 3), dtype),
        jnp.zeros((), dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype),
        jnp.zeros((), bool),
    )
    (R, v, p, Jq, Jv, Jp, *_), dts = jax.lax.scan(step, init, (imu_t, gyro, acc, mask))
    return Preintegration(dR=R, dv=v, dp=p, dt=jnp.sum(dts), J_q_bg=Jq, J_v_bg=Jv, J_p_bg=Jp)


def preintegrate_sequence(imu_t, gyro, acc, mask, bg=None, ba=None):
    """vmap over frame gaps: inputs (K, S, ...) -> Preintegration with leading K.

    NOTE: each frame's slab covers (t_{k-1}, t_k], so slab k IS the
    preintegration support for gap (k-1, k); the left endpoint sample is the
    last sample of the previous slab — we splice it in by prepending.
    """
    K, S = mask.shape
    dtype = gyro.dtype
    if bg is None:
        bg = jnp.zeros(3, dtype)
    if ba is None:
        ba = jnp.zeros(3, dtype)
    # prepend the previous slab's last valid sample as the left endpoint
    def last_valid(arr_t, arr_g, arr_a, m):
        idx = jnp.maximum(jnp.sum(m) - 1, 0)
        return arr_t[idx], arr_g[idx], arr_a[idx], m[idx]

    lt, lg, la, lm = jax.vmap(last_valid)(imu_t, gyro, acc, mask)
    # shift by one: gap k uses previous slab's endpoint
    pt = jnp.concatenate([imu_t[:1, :1] * 0 - 1e9, lt[:-1, None]], axis=0)
    pg = jnp.concatenate([jnp.zeros((1, 1, 3), dtype), lg[:-1, None]], axis=0)
    pa = jnp.concatenate([jnp.zeros((1, 1, 3), dtype), la[:-1, None]], axis=0)
    pm = jnp.concatenate([jnp.zeros((1, 1), bool), lm[:-1, None]], axis=0)
    imu_t2 = jnp.concatenate([pt, imu_t], axis=1)
    gyro2 = jnp.concatenate([pg, gyro], axis=1)
    acc2 = jnp.concatenate([pa, acc], axis=1)
    mask2 = jnp.concatenate([pm, mask], axis=1)
    return jax.vmap(lambda t, g, a, m: preintegrate(t, g, a, m, bg, ba))(imu_t2, gyro2, acc2, mask2)
