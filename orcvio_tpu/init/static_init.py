"""Static (inclinometer) initializer.

TPU-native equivalent of ``src/StaticInitializer.cpp``: count consecutive
frames whose (outlier-trimmed) max feature motion stays under a threshold;
once ``static_image_num`` is reached, set the gyro bias to the mean angular
rate and align the initial orientation with gravity from the mean specific
force (StaticInitializer.cpp:20-135). Implemented as a pure pytree step so it
jits and composes with the filter step under ``lax.cond``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..config.core import FilterConfig
from ..math import so3
from ..filter.state import FilterState, ImuState


class StaticInitState(struct.PyTreeNode):
    counter: jnp.ndarray  # consecutive static frames
    started: jnp.ndarray  # bool — reference frame captured
    ref_fid: jnp.ndarray  # (M,) int32
    ref_uv: jnp.ndarray  # (M, 2)
    sum_gyro: jnp.ndarray  # (3,) accumulated raw gyro since start
    sum_acc: jnp.ndarray  # (3,)
    n_imu: jnp.ndarray  # int32
    done: jnp.ndarray  # bool

    @classmethod
    def create(cls, max_obs: int, dtype=jnp.float32):
        return cls(
            counter=jnp.zeros((), jnp.int32),
            started=jnp.zeros((), bool),
            ref_fid=-jnp.ones((max_obs,), jnp.int32),
            ref_uv=jnp.zeros((max_obs, 2), dtype),
            sum_gyro=jnp.zeros(3, dtype),
            sum_acc=jnp.zeros(3, dtype),
            n_imu=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
        )


def static_init_step(cfg: FilterConfig, s: StaticInitState, fids, uvs, meas_mask,
                     imu_gyro, imu_acc, imu_mask) -> StaticInitState:
    """One frame of the static-init state machine. Ref: tryIncInit (StaticInitializer.cpp:20)."""
    M = fids.shape[0]
    # accumulate IMU between the first image and now (initializeGravityAndBias)
    add = imu_mask[:, None].astype(s.sum_gyro.dtype)
    sum_gyro = s.sum_gyro + jnp.sum(imu_gyro * add, axis=0)
    sum_acc = s.sum_acc + jnp.sum(imu_acc * add, axis=0)
    n_imu = s.n_imu + jnp.sum(imu_mask).astype(jnp.int32)

    valid = meas_mask & (fids >= 0)
    # match against the reference frame
    eq = (fids[:, None] == s.ref_fid[None, :]) & valid[:, None] & (s.ref_fid >= 0)[None, :]
    matched = jnp.any(eq, axis=1)
    ref_row = jnp.argmax(eq, axis=1)
    d = jnp.linalg.norm(uvs - s.ref_uv[ref_row], axis=1)
    d = jnp.where(matched, d, -1.0)  # unmatched sort first
    n_match = jnp.sum(matched)

    # "ignore outliers rudely": take the k-th largest distance (:44-50)
    d_sorted = jnp.sort(d)  # ascending
    k = jnp.clip(M - 1 - cfg.static_outlier_ignore, 0, M - 1)
    max_dis = d_sorted[k]

    is_static = (n_match >= cfg.static_min_matches) & (max_dis < cfg.zupt_max_feature_dis)
    not_started = ~s.started

    counter = jnp.where(not_started, 0, jnp.where(is_static, s.counter + 1, 0))
    # reference frame updates on the first frame and on each static frame
    take_ref = not_started | is_static
    ref_fid = jnp.where(take_ref, jnp.where(valid, fids, -1), s.ref_fid)
    ref_uv = jnp.where(take_ref, uvs, s.ref_uv)
    done = s.done | (counter >= cfg.static_image_num)

    return s.replace(
        counter=counter,
        started=jnp.ones((), bool),
        ref_fid=ref_fid,
        ref_uv=ref_uv,
        sum_gyro=sum_gyro,
        sum_acc=sum_acc,
        n_imu=n_imu,
        done=done,
    )


def initial_imu_state(cfg: FilterConfig, s: StaticInitState, dtype=jnp.float32) -> ImuState:
    """Gravity-aligned initial state. Ref: initializeGravityAndBias (StaticInitializer.cpp:77-135)."""
    n = jnp.maximum(s.n_imu, 1).astype(s.sum_gyro.dtype)
    gyro_bias = s.sum_gyro / n
    gravity_imu = s.sum_acc / n
    g_norm = jnp.linalg.norm(gravity_imu)
    # rotation taking gravity_imu to +z*g_norm (q0_w_i FromTwoVectors(g_imu, -g_w))
    a = gravity_imu / jnp.maximum(g_norm, 1e-9)
    b = jnp.asarray([0.0, 0.0, 1.0], a.dtype)
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    # Rodrigues from axis-angle sin = |v|, cos = c; degenerate c ~ -1 handled
    vn = jnp.linalg.norm(v)
    axis = jnp.where(vn > 1e-9, v / jnp.maximum(vn, 1e-9), jnp.asarray([1.0, 0.0, 0.0], a.dtype))
    ang = jnp.arctan2(vn, c)
    R = so3.exp(axis * ang)
    z = jnp.zeros(3, dtype)
    return ImuState(R=R.astype(dtype), v=z, p=z, bg=gyro_bias.astype(dtype), ba=z)
