"""Synthetic VIO world: analytic trajectory, autodiff-exact IMU, landmark tracks.

The reference has no simulator (its tests use recorded .h5 fixtures); this is
the framework's controlled-truth integration harness: a smooth analytic SE(3)
trajectory whose exact body-rate gyro/accel are obtained by automatic
differentiation, plus projected landmark observations — used by the end-to-end
filter tests and as the benchmark workload.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..filter.pipeline import FrameInput
from ..math import so3


@dataclasses.dataclass(frozen=True)
class SimConfig:
    n_frames: int = 100
    frame_hz: float = 20.0
    imu_hz: float = 200.0
    imu_slab: int = 24
    n_landmarks: int = 300
    max_obs: int = 60  # measurement capacity per frame
    radius: float = 3.0
    omega: float = 0.6  # trajectory angular frequency
    gravity: float = 9.81
    fov_limit: float = 1.2  # normalized-coordinate field of view (~100 deg)
    uv_noise: float = 0.002
    gyro_noise: float = 0.004
    acc_noise: float = 0.08
    seed: int = 0
    static_time: float = 0.0  # initial stationary period (for init testing)
    height: float = 0.0  # trajectory altitude offset (for ground-plane rendering)
    ramp_time: float = 1.0  # C2 smooth ramp-in duration after static_time


def _warp_time(sim: SimConfig, t):
    """C2 time warp: 0 until static_time, smoothly ramps to t - static_time."""
    if sim.static_time <= 0:
        return t
    u = jnp.clip((t - sim.static_time) / sim.ramp_time, 0.0, 1.0)
    w = u * u * u * (10.0 - 15.0 * u + 6.0 * u * u)  # smoothstep (C2)
    return (t - sim.static_time) * w


def trajectory_pose(sim: SimConfig, t):
    """Analytic (R(t), p(t)): a circle with yaw tracking + roll/pitch wobble."""
    t = _warp_time(sim, t)
    w = sim.omega
    p = jnp.stack(
        [
            sim.radius * jnp.sin(w * t),
            sim.radius * (1.0 - jnp.cos(w * t)),
            sim.height + 0.4 * jnp.sin(0.7 * w * t),
        ]
    )
    yaw = w * t
    roll = 0.15 * jnp.sin(1.3 * w * t)
    pitch = 0.12 * jnp.sin(0.9 * w * t + 0.5)
    R = so3.exp(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw])) @ so3.exp(
        jnp.stack([roll, pitch, jnp.zeros_like(roll)])
    )
    return R, p


def imu_measurements(sim: SimConfig, t):
    """Exact gyro/accel at time t via autodiff of the analytic trajectory."""

    def pose_flat(tt):
        R, p = trajectory_pose(sim, tt)
        return jnp.concatenate([R.reshape(9), p])

    d = jax.jacobian(pose_flat)(t)
    dd = jax.jacobian(lambda tt: jax.jacobian(pose_flat)(tt))(t)
    R, _ = trajectory_pose(sim, t)
    Rdot = d[:9].reshape(3, 3)
    pddot = dd[9:12]
    gyro = so3.vee(R.T @ Rdot)
    g_w = jnp.asarray([0.0, 0.0, -sim.gravity])
    acc = R.T @ (pddot - g_w)
    return gyro, acc


def _landmarks_np(sim: SimConfig):
    rng = np.random.default_rng(sim.seed)
    # ring of landmarks around / outside the circle, various heights
    ang = rng.uniform(0, 2 * np.pi, sim.n_landmarks)
    rad = rng.uniform(sim.radius + 1.5, sim.radius + 6.0, sim.n_landmarks)
    z = rng.uniform(-2.0, 3.0, sim.n_landmarks)
    pts = np.stack([rad * np.sin(ang), rad * (1 - np.cos(ang)) , z], axis=1)
    # recentre roughly on the circle's center (0, r)
    pts[:, 1] = rng.uniform(-3.0, sim.radius * 2 + 3.0, sim.n_landmarks)
    pts[:, 0] = rng.uniform(-sim.radius - 4, sim.radius + 4, sim.n_landmarks)
    return pts


def make_landmarks(sim: SimConfig):
    return jnp.asarray(_landmarks_np(sim))


# ---------------------------------------------------------------------------
# Host-side (numpy f64) trajectory evaluation.
#
# generate() must run entirely on the host: on the tunneled TPU backend every
# eager op dispatch costs ~1 s of compile latency and the FIRST device->host
# readback of a process costs 60-90 s, so a generator that mixes small jax
# calls with numpy post-processing takes minutes for even a 4-frame sequence
# (measured round 2). The analytic trajectory is closed-form, so poses are
# evaluated in numpy f64 and the IMU comes from high-order central finite
# differences — truncation ~1e-8, far below the smallest configured
# measurement noise, and *more* accurate than the previous f32 on-device
# autodiff. The jax trajectory_pose/imu_measurements above remain the
# differentiable reference implementations (cross-checked in tests).
# ---------------------------------------------------------------------------


def _warp_time_np(sim: SimConfig, t):
    if sim.static_time <= 0:
        return t
    u = np.clip((t - sim.static_time) / sim.ramp_time, 0.0, 1.0)
    w = u * u * u * (10.0 - 15.0 * u + 6.0 * u * u)
    return (t - sim.static_time) * w


def _so3_exp_np(w):
    """Rodrigues, vectorized: w (..., 3) -> (..., 3, 3), f64-safe near 0."""
    th = np.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    K = np.zeros(w.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -w[..., 2], w[..., 1]
    K[..., 1, 0], K[..., 1, 2] = w[..., 2], -w[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -w[..., 1], w[..., 0]
    small = th < 1e-8
    th_s = np.where(small, 1.0, th)
    a = np.where(small, 1.0 - th**2 / 6.0, np.sin(th_s) / th_s)
    b = np.where(small, 0.5 - th**2 / 24.0, (1.0 - np.cos(th_s)) / th_s**2)
    eye = np.broadcast_to(np.eye(3), K.shape)
    return eye + a * K + b * (K @ K)


def trajectory_pose_np(sim: SimConfig, t):
    """Numpy-f64 analytic pose, vectorized over t: (..., 3, 3), (..., 3)."""
    t = _warp_time_np(sim, np.asarray(t, np.float64))
    w = sim.omega
    p = np.stack(
        [
            sim.radius * np.sin(w * t),
            sim.radius * (1.0 - np.cos(w * t)),
            sim.height + 0.4 * np.sin(0.7 * w * t) * np.ones_like(t),
        ],
        axis=-1,
    )
    yaw = w * t
    roll = 0.15 * np.sin(1.3 * w * t)
    pitch = 0.12 * np.sin(0.9 * w * t + 0.5)
    zero = np.zeros_like(yaw)
    R = _so3_exp_np(np.stack([zero, zero, yaw], -1)) @ _so3_exp_np(
        np.stack([roll, pitch, zero], -1)
    )
    return R, p


# 5-point central-difference stencils (f64): first derivative O(h^4), second
# derivative O(h^4); h chosen so truncation ~ roundoff ~ 1e-9.
_FD1 = (np.array([1.0, -8.0, 8.0, -1.0]) / 12.0, np.array([-2, -1, 1, 2]), 1e-4)
_FD2 = (np.array([-1.0, 16.0, -30.0, 16.0, -1.0]) / 12.0, np.array([-2, -1, 0, 1, 2]), 1e-3)


def velocity_np(sim: SimConfig, t):
    """dp/dt by finite differences; vectorized over t -> (..., 3)."""
    c, off, h = _FD1
    t = np.asarray(t, np.float64)
    return sum(
        ci * trajectory_pose_np(sim, t + oi * h)[1] for ci, oi in zip(c, off)
    ) / h


def imu_np(sim: SimConfig, t):
    """Exact-trajectory gyro/accel via f64 finite differences; vectorized.

    gyro = vee(R^T dR/dt);  acc = R^T (d2p/dt2 - g).
    """
    t = np.asarray(t, np.float64)
    c1, off1, h1 = _FD1
    Rdot = sum(
        ci * trajectory_pose_np(sim, t + oi * h1)[0] for ci, oi in zip(c1, off1)
    ) / h1
    c2, off2, h2 = _FD2
    pddot = sum(
        ci * trajectory_pose_np(sim, t + oi * h2)[1] for ci, oi in zip(c2, off2)
    ) / (h2 * h2)
    R, _ = trajectory_pose_np(sim, t)
    W = np.swapaxes(R, -1, -2) @ Rdot  # skew(omega_body)
    gyro = np.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)
    g_w = np.array([0.0, 0.0, -sim.gravity])
    acc = np.einsum("...ji,...j->...i", R, pddot - g_w)
    return gyro, acc


def initial_state_np(sim: SimConfig):
    """(R0, p0, v0) at t=0 as numpy — host-only, no device dispatches."""
    R0, p0 = trajectory_pose_np(sim, 0.0)
    return R0, p0, velocity_np(sim, 0.0)


class SimData(NamedTuple):
    frames: FrameInput  # stacked over time, leading dim n_frames
    gt_R: jnp.ndarray  # (T, 3, 3)
    gt_p: jnp.ndarray  # (T, 3)
    gt_v: jnp.ndarray  # (T, 3)
    landmarks: jnp.ndarray


def generate(sim: SimConfig, R_b2c=None, t_c_b=None) -> SimData:
    """Build the full stacked FrameInput sequence — entirely host-side.

    Pure numpy f64 (no device dispatches, no readbacks — see the host-side
    section below for why that matters on the tunneled TPU backend); the
    result leaves are converted to device arrays once at the end."""
    return _generate(sim, R_b2c, t_c_b)


def _generate(sim: SimConfig, R_b2c=None, t_c_b=None) -> SimData:
    R_b2c = np.eye(3) if R_b2c is None else np.asarray(R_b2c, np.float64)
    t_c_b = np.zeros(3) if t_c_b is None else np.asarray(t_c_b, np.float64)
    rng = np.random.default_rng(sim.seed + 1)
    dt_f = 1.0 / sim.frame_hz
    dt_i = 1.0 / sim.imu_hz
    lm_n = _landmarks_np(sim)

    frame_ts = (np.arange(sim.n_frames) + 1) * dt_f

    # IMU samples per frame: (t_{k-1}, t_k]
    all_imu_t = []
    all_mask = []
    for k, t_img in enumerate(frame_ts):
        t_prev = t_img - dt_f
        ts = t_prev + dt_i * (1 + np.arange(sim.imu_slab))
        mask = ts <= t_img + 1e-9
        all_imu_t.append(ts)
        all_mask.append(mask)
    imu_t = np.stack(all_imu_t)  # (T, S)
    imu_mask = np.stack(all_mask)
    gyro, acc = imu_np(sim, imu_t.reshape(-1))
    gyro = gyro.reshape(sim.n_frames, sim.imu_slab, 3)
    acc = acc.reshape(sim.n_frames, sim.imu_slab, 3)
    gyro = gyro + rng.normal(size=gyro.shape) * sim.gyro_noise
    acc = acc + rng.normal(size=acc.shape) * sim.acc_noise

    gt_R, gt_p = trajectory_pose_np(sim, frame_ts)
    gt_v = velocity_np(sim, frame_ts)

    # observations
    M = sim.max_obs
    fids = np.full((sim.n_frames, M), -1, np.int32)
    uvs = np.zeros((sim.n_frames, M, 2))
    uv_vels = np.zeros((sim.n_frames, M, 2))
    meas_mask = np.zeros((sim.n_frames, M), bool)
    R_b2c_n = R_b2c
    t_c_b_n = t_c_b
    for k in range(sim.n_frames):
        R_c2w = gt_R[k] @ R_b2c_n.T
        t_cw = gt_p[k] + gt_R[k] @ t_c_b_n
        pc = (lm_n - t_cw) @ R_c2w  # (N, 3) in camera frame
        vis = (pc[:, 2] > 0.5) & (np.abs(pc[:, 0] / np.maximum(pc[:, 2], 1e-6)) < sim.fov_limit) & (
            np.abs(pc[:, 1] / np.maximum(pc[:, 2], 1e-6)) < sim.fov_limit
        )
        idx = np.nonzero(vis)[0][:M]
        n = len(idx)
        fids[k, :n] = idx
        uv = pc[idx, :2] / pc[idx, 2:3]
        uvs[k, :n] = uv + rng.normal(size=(n, 2)) * sim.uv_noise
        meas_mask[k, :n] = True

    frames = FrameInput(
        t=jnp.asarray(frame_ts),
        imu_t=jnp.asarray(imu_t),
        imu_gyro=jnp.asarray(gyro),
        imu_acc=jnp.asarray(acc),
        imu_mask=jnp.asarray(imu_mask),
        fids=jnp.asarray(fids),
        uvs=jnp.asarray(uvs),
        uv_vels=jnp.asarray(uv_vels),
        meas_mask=jnp.asarray(meas_mask),
    )
    return SimData(frames=frames, gt_R=jnp.asarray(gt_R), gt_p=jnp.asarray(gt_p),
                   gt_v=jnp.asarray(gt_v), landmarks=jnp.asarray(lm_n))


# ---------------------------------------------------------------------------
# Image rendering: textured ground plane (for front-end + full-stack tests)
# ---------------------------------------------------------------------------

def smooth_texture(H, W, seed=0, octaves=5, lo=40.0, hi=220.0):
    """Band-limited random texture with structure at several scales."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W))
    for o in range(octaves):
        h, w = max(H >> (octaves - o), 2), max(W >> (octaves - o), 2)
        layer = rng.normal(size=(h, w))
        img += np.asarray(jax.image.resize(jnp.asarray(layer), (H, W), method="linear")) * (2.0**o)
    img = (img - img.min()) / (img.max() - img.min())
    return jnp.asarray(lo + img * (hi - lo), jnp.float32)


def render_plane_view(texture, tex_scale, R_c2w, t_c_w, K, height, width):
    """Render the camera view of a textured z=0 ground plane.

    texture: (Ht, Wt); tex_scale: meters per texel; K = (fx, fy, cx, cy).
    Pixels whose ray misses the plane (d_z >= 0) render as 0.
    """
    from ..frontend.image import bilinear_sample

    fx, fy, cx, cy = K
    vv, uu = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32), jnp.arange(width, dtype=jnp.float32), indexing="ij"
    )
    rays_c = jnp.stack([(uu - cx) / fx, (vv - cy) / fy, jnp.ones_like(uu)], axis=-1)
    d = jnp.einsum("ij,hwj->hwi", R_c2w, rays_c)
    lam = -t_c_w[2] / jnp.where(d[..., 2] < -1e-6, d[..., 2], -1e-6)
    Pxy = t_c_w[None, None, :2] + lam[..., None] * d[..., :2]
    tex_xy = Pxy / tex_scale + jnp.asarray(
        [texture.shape[1] / 2.0, texture.shape[0] / 2.0], jnp.float32
    )
    vals = bilinear_sample(texture, tex_xy.reshape(-1, 2)).reshape(height, width)
    visible = (d[..., 2] < -1e-3) & (lam > 0.1)
    return jnp.where(visible, vals, 0.0)
