"""Zero-velocity updates (ZUPT): feature- and IMU-based detection + vpq update.

TPU-native equivalent of ``checkZUPTFeat`` (orcvio.cpp:3081), ``checkZUPTIMU``
(:3129, the OpenVINS-style chi-square disturbance test) and
``measurementUpdate_ZUPT_vpq`` (:3326, pseudo-measurements v = 0,
p_curr = p_prev, q_curr = q_prev on the two newest clones).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..math import quat, so3
from .state import LEG, FilterState
from .update import apply_ekf_update

# OpenVINS-style IMU disturbance noise (orcvio.cpp:3140-3152, hardcoded there)
_SIGMA_W2 = 1.6968e-4**2
_SIGMA_A2 = 2.0e-3**2
_SIGMA_WB = 1.9393e-05
_SIGMA_AB = 3.0e-03
_ZUPT_MAX_VELOCITY = 0.25
_ZUPT_NOISE_V = 1e-2  # zupt_noise_v/p/q (config keys; euroc-scale defaults)
_ZUPT_NOISE_P = 1e-2
_ZUPT_NOISE_Q = 1e-2


def check_zupt_feat(cfg: FilterConfig, state: FilterState, outlier_ignore: int = 8):
    """Static scene from feature motion. Ref: checkZUPTFeat (orcvio.cpp:3081).

    Uses the distance between each live feature's two newest observations;
    requires >= 20 tracked features and the (outlier_ignore+1)-th largest
    distance below zupt_max_feature_dis.
    """
    ft = state.features
    order = jnp.where(ft.uv_valid, state.clones.order[None, :], jnp.iinfo(jnp.int32).min)
    newest = jnp.argmax(order, axis=1)
    order2 = order.at[jnp.arange(order.shape[0]), newest].set(jnp.iinfo(jnp.int32).min)
    second = jnp.argmax(order2, axis=1)
    has_two = (jnp.sum(ft.uv_valid, axis=1) >= 2) & ft.active
    uv_n = jnp.take_along_axis(ft.uv, newest[:, None, None], axis=1)[:, 0]
    uv_p = jnp.take_along_axis(ft.uv, second[:, None, None], axis=1)[:, 0]
    d = jnp.linalg.norm(uv_n - uv_p, axis=1)
    d = jnp.where(has_two, d, -1.0)
    n = jnp.sum(has_two)
    d_sorted = jnp.sort(d)  # ascending
    k = d.shape[0] - 1 - outlier_ignore
    max_dis = d_sorted[jnp.clip(k, 0, d.shape[0] - 1)]
    return (n >= 20) & (max_dis < cfg.zupt_max_feature_dis) & (max_dis >= 0)


def check_zupt_imu(cfg: FilterConfig, state: FilterState, imu_t, gyro_m, acc_m, imu_mask,
                   chi2_table, chi2_multiplier: float = 1.0):
    """IMU disturbance chi-square test. Ref: checkZUPTIMU (orcvio.cpp:3129).

    Residuals per sample: [gyro ~ 0 (zeroed, as the reference does),
    R(acc - ba) + g ~ 0]; marginal covariance over [theta, bg, ba].
    """
    S_n = imu_t.shape[0]
    dtype = state.P.dtype
    wRi = state.imu.R
    acc = acc_m - state.imu.ba
    gyro = gyro_m - state.imu.bg

    dt = jnp.diff(imu_t, prepend=imu_t[:1])
    dt = jnp.where(dt > 1e-6, dt, 1e-2)
    pair_mask = imu_mask & jnp.roll(imu_mask, 1)
    pair_mask = pair_mask.at[0].set(False)

    # residuals (S, 6): gyro rows zeroed (orcvio.cpp:3196-3199)
    r_a = -(jnp.einsum("ij,sj->si", wRi, acc) + jnp.asarray([0, 0, -cfg.gravity], dtype))
    r = jnp.concatenate([jnp.zeros((S_n, 3), dtype), r_a], axis=1)
    r = jnp.where(pair_mask[:, None], r, 0.0)

    # H (S, 6, 9) over [theta, bg, ba]
    H = jnp.zeros((S_n, 6, 9), dtype)
    H = H.at[:, 0:3, 3:6].set(jnp.eye(3, dtype=dtype))
    if cfg.use_left_perturbation:
        H = H.at[:, 3:6, 0:3].set(so3.hat(jnp.einsum("ij,sj->si", wRi, acc)))
    else:
        H = H.at[:, 3:6, 0:3].set(wRi @ so3.hat(acc))
    H = H.at[:, 3:6, 6:9].set(jnp.broadcast_to(wRi, (S_n, 3, 3)))
    H = jnp.where(pair_mask[:, None, None], H, 0.0)

    # noise: continuous->discrete per sample
    Rw = _SIGMA_W2 / dt
    Ra = _SIGMA_A2 / dt
    Rdiag = jnp.concatenate([jnp.tile(Rw[:, None], (1, 3)), jnp.tile(Ra[:, None], (1, 3))], axis=1)
    Rdiag = jnp.where(pair_mask[:, None], Rdiag, 1.0).reshape(-1)

    # marginal P over [theta, bg, ba] + bias random walk (orcvio.cpp:3235-3258)
    idx = jnp.concatenate([jnp.arange(0, 3), jnp.arange(9, 15)])
    P_marg = state.P[idx[:, None], idx[None, :]]
    dt_sum = jnp.sum(jnp.where(pair_mask, dt, 0.0))
    Qb = jnp.zeros((9, 9), dtype)
    Qb = Qb.at[3:6, 3:6].set(dt_sum * _SIGMA_WB * jnp.eye(3, dtype=dtype))
    Qb = Qb.at[6:9, 6:9].set(dt_sum * _SIGMA_AB * jnp.eye(3, dtype=dtype))
    P_marg = P_marg + Qb

    Hm = H.reshape(-1, 9)
    rm = r.reshape(-1)
    S = Hm @ P_marg @ Hm.T + jnp.diag(Rdiag)
    chi2 = rm @ jnp.linalg.solve(S, rm)
    dof = jnp.clip(jnp.sum(pair_mask) * 3, 1, chi2_table.shape[0] - 1)  # acc rows only
    ok_chi2 = chi2 < chi2_multiplier * chi2_table[dof]
    ok_vel = jnp.linalg.norm(state.imu.v) < _ZUPT_MAX_VELOCITY
    return ok_chi2 & ok_vel & (jnp.sum(pair_mask) >= 2)


def zupt_update(cfg: FilterConfig, state: FilterState):
    """v/p/q pseudo-measurement update. Ref: measurementUpdate_ZUPT_vpq (orcvio.cpp:3326)."""
    D = state.P.shape[0]
    dtype = state.P.dtype
    order = jnp.where(state.clones.valid, state.clones.order, jnp.iinfo(jnp.int32).min)
    cur = jnp.argmax(order)
    order2 = order.at[cur].set(jnp.iinfo(jnp.int32).min)
    prev = jnp.argmax(order2)
    have_two = jnp.sum(state.clones.valid) >= 2

    cc = LEG + 6 * cur
    cp = LEG + 6 * prev
    H = jnp.zeros((9, D), dtype)
    H = H.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))  # velocity
    eye = jnp.eye(3, dtype=dtype)
    H = jax.lax.dynamic_update_slice(H, eye, (3, cc + 3))  # p_curr
    H = jax.lax.dynamic_update_slice(H, -eye, (3, cp + 3))  # p_prev
    H = jax.lax.dynamic_update_slice(H, -0.5 * eye, (6, cc))  # q_curr
    H = jax.lax.dynamic_update_slice(H, 0.5 * eye, (6, cp))  # q_prev

    r = jnp.zeros((9,), dtype)
    r = r.at[0:3].set(-state.imu.v)
    p_c = state.clones.p[cur]
    p_p = state.clones.p[prev]
    r = r.at[3:6].set(-(p_c - p_p))
    q_c = quat.from_rotation(state.clones.R[cur])
    q_p = quat.from_rotation(state.clones.R[prev])
    dq = quat.multiply(q_c, quat.inverse(q_p))
    r = r.at[6:9].set(dq[:3])

    # noise-weighted rows so the shared (sigma^2 I)-noise update applies:
    # scale row i by sigma_obs / sigma_i
    sig = jnp.concatenate([
        jnp.full((3,), jnp.sqrt(_ZUPT_NOISE_V), dtype),
        jnp.full((3,), jnp.sqrt(_ZUPT_NOISE_P), dtype),
        jnp.full((3,), jnp.sqrt(_ZUPT_NOISE_Q), dtype),
    ])
    scale = cfg.observation_noise / sig
    Hs = H * scale[:, None]
    rs = r * scale

    new_state, dx = apply_ekf_update(cfg, state, Hs, rs)
    return jax.tree.map(lambda a, b: jnp.where(have_two, a, b), new_state, state)
