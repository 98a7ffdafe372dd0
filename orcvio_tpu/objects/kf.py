"""Batched linear Kalman filters for keypoint smoothing and SORT boxes.

TPU-native equivalents of the reference's per-keypoint constant-velocity KF
(``src/feat/kf.cpp``: 4-state [x, y, vx, vy], noise_ax = noise_ay = 9,
R = 0.0225 I) and SORT's 7-state box KF
(``ros_wrapper/src/sort_ros/src/KalmanTracker.cpp``: [cx, cy, area, ratio,
vcx, vcy, varea], Q = 1e-2 I, R = 1e-2 I). Both run over arbitrary leading
batch dims — the reference's per-track object loops become one fused update.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Kf4State(NamedTuple):
    x: jnp.ndarray  # (..., 4) [x, y, vx, vy]
    P: jnp.ndarray  # (..., 4, 4)
    t: jnp.ndarray  # (...,) last update time
    init: jnp.ndarray  # (...,) bool


def kf4_create(batch, dtype=jnp.float32):
    return Kf4State(
        x=jnp.zeros(batch + (4,), dtype),
        P=jnp.zeros(batch + (4, 4), dtype),
        t=jnp.zeros(batch, dtype),
        init=jnp.zeros(batch, bool),
    )


_P0_DIAG = jnp.asarray([1.0, 1.0, 1000.0, 1000.0])
_V_INIT = 3.0 / 0.1  # kf.cpp:74
_NOISE_A = 9.0
_R_KP = 0.0225


def kf4_step(s: Kf4State, z, t, meas_valid):
    """Predict + update with measurement z (..., 2) at time t (...,).

    Uninitialized tracks initialize from the measurement (kf.cpp:62-81);
    invalid measurements leave the state untouched (the reference only calls
    ProcessMeasurement for observed keypoints).
    """
    dtype = s.x.dtype
    dt = (t - s.t)[..., None]
    # transition
    x_pred = s.x.at[..., 0:2].add(dt * s.x[..., 2:4])
    F = jnp.broadcast_to(jnp.eye(4, dtype=dtype), s.P.shape)
    F = F.at[..., 0, 2].set(dt[..., 0])
    F = F.at[..., 1, 3].set(dt[..., 0])
    dt2 = (dt * dt)[..., None]
    dt3_2 = dt2 * dt[..., None] / 2
    dt4_4 = dt2 * dt2 / 4
    Q = jnp.zeros_like(s.P)
    Q = Q.at[..., 0, 0].set(dt4_4[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 1, 1].set(dt4_4[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 0, 2].set(dt3_2[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 2, 0].set(dt3_2[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 1, 3].set(dt3_2[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 3, 1].set(dt3_2[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 2, 2].set(dt2[..., 0, 0] * _NOISE_A)
    Q = Q.at[..., 3, 3].set(dt2[..., 0, 0] * _NOISE_A)
    P_pred = F @ s.P @ jnp.swapaxes(F, -1, -2) + Q

    # update (H = [I2 0])
    y = z - x_pred[..., 0:2]
    S = P_pred[..., 0:2, 0:2] + _R_KP * jnp.eye(2, dtype=dtype)
    S_inv = jnp.linalg.inv(S)
    K = P_pred[..., :, 0:2] @ S_inv  # (..., 4, 2)
    x_new = x_pred + jnp.einsum("...ij,...j->...i", K, y)
    P_new = P_pred - K @ P_pred[..., 0:2, :]

    # initialization branch
    x0 = jnp.concatenate([z, jnp.full_like(z, _V_INIT)], axis=-1)
    P0 = jnp.broadcast_to(jnp.diag(_P0_DIAG).astype(dtype), s.P.shape)

    was_init = s.init
    upd = meas_valid
    x = jnp.where((upd & was_init)[..., None], x_new, jnp.where(upd[..., None], x0, s.x))
    P = jnp.where(
        (upd & was_init)[..., None, None], P_new, jnp.where(upd[..., None, None], P0, s.P)
    )
    t_out = jnp.where(upd, t, s.t)
    return Kf4State(x=x, P=P, t=t_out, init=s.init | upd)


def kf4_position(s: Kf4State):
    return s.x[..., 0:2]


# ---------------------------------------------------------------------------
# SORT 7-state box KF: [cx, cy, area, ratio, vcx, vcy, varea]
# ---------------------------------------------------------------------------

class Kf7State(NamedTuple):
    x: jnp.ndarray  # (..., 7)
    P: jnp.ndarray  # (..., 7, 7)


_F7 = jnp.eye(7).at[0, 4].set(1.0).at[1, 5].set(1.0).at[2, 6].set(1.0)
_Q7 = 1e-2
_R7 = 1e-2


def bbox_to_z(bbox):
    """xmin,ymin,xmax,ymax -> cx,cy,area,ratio (KalmanTracker.cpp:37-40)."""
    w = bbox[..., 2] - bbox[..., 0]
    h = jnp.maximum(bbox[..., 3] - bbox[..., 1], 1e-6)
    return jnp.stack(
        [bbox[..., 0] + w / 2, bbox[..., 1] + h / 2, w * h, w / h], axis=-1
    )


def z_to_bbox(z):
    w = jnp.sqrt(jnp.maximum(z[..., 2] * z[..., 3], 1e-12))
    h = jnp.maximum(z[..., 2], 1e-12) / w
    return jnp.stack(
        [z[..., 0] - w / 2, z[..., 1] - h / 2, z[..., 0] + w / 2, z[..., 1] + h / 2],
        axis=-1,
    )


def kf7_init(bbox, dtype=jnp.float32):
    z = bbox_to_z(bbox)
    x = jnp.concatenate([z, jnp.zeros(z.shape[:-1] + (3,), dtype)], axis=-1)
    P = jnp.broadcast_to(jnp.eye(7, dtype=dtype), x.shape + (7,))
    return Kf7State(x=x, P=P)


def kf7_predict(s: Kf7State):
    F = _F7.astype(s.x.dtype)
    x = jnp.einsum("ij,...j->...i", F, s.x)
    P = F @ s.P @ F.T + _Q7 * jnp.eye(7, dtype=s.x.dtype)
    return Kf7State(x=x, P=P)


def kf7_update(s: Kf7State, bbox, valid):
    z = bbox_to_z(bbox)
    y = z - s.x[..., :4]
    S = s.P[..., :4, :4] + _R7 * jnp.eye(4, dtype=s.x.dtype)
    K = s.P[..., :, :4] @ jnp.linalg.inv(S)
    x_new = s.x + jnp.einsum("...ij,...j->...i", K, y)
    P_new = s.P - K @ s.P[..., :4, :]
    x = jnp.where(valid[..., None], x_new, s.x)
    P = jnp.where(valid[..., None, None], P_new, s.P)
    return Kf7State(x=x, P=P)
