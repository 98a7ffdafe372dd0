"""SE(3) operations, batched and jit-safe.

TPU-native equivalent of ``include/orcvio/utils/se3_ops.hpp``. Twist convention
matches the reference (and Sophus): xi = [rho, phi] with the translation part
first — see ``se3_ops.hpp:510`` (odotOperator) whose first three columns multiply
the translation perturbation.

Everything here accepts arbitrary leading batch dims; per-point loops in the
reference (e.g. ``project_object_points_df_object``, se3_ops.hpp:351+) become
plain broadcasted tensor ops that XLA fuses.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import so3


def exp(xi):
    """se(3) twist (..., 6) [rho, phi] -> homogeneous transform (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3.exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(phi), rho)
    return make_pose(R, t)


def log(T):
    """(..., 4, 4) -> (..., 6) [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3.log(R)
    rho = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def make_pose(R, t):
    """Assemble (..., 4, 4) from (..., 3, 3) and (..., 3)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    top = jnp.concatenate(
        [jnp.broadcast_to(R, batch + (3, 3)), jnp.broadcast_to(t, batch + (3,))[..., None]],
        axis=-1,
    )
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_pose(T):
    """Inverse of a rigid transform. Ref: se3_ops.hpp:30-180 (inversePose)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def odot(ph):
    """odot operator, (..., 4) homogeneous point -> (..., 4, 6). Ref: se3_ops.hpp:510.

    [[w * I3, -hat(xyz)], [0, 0]]
    """
    ph = jnp.asarray(ph)
    batch = ph.shape[:-1]
    out = jnp.zeros(batch + (4, 6), dtype=ph.dtype)
    w = ph[..., 3]
    eye = jnp.eye(3, dtype=ph.dtype)
    out = out.at[..., :3, :3].set(w[..., None, None] * eye)
    out = out.at[..., :3, 3:].set(-so3.hat(ph[..., :3]))
    return out


def circled_circ(ph):
    """circledCirc operator, (..., 4) -> (..., 6, 4). Ref: se3_ops.hpp:230.

    rows 0:3, col 3 = xyz; rows 3:6, cols 0:3 = -hat(xyz).
    """
    ph = jnp.asarray(ph)
    batch = ph.shape[:-1]
    out = jnp.zeros(batch + (6, 4), dtype=ph.dtype)
    out = out.at[..., :3, 3].set(ph[..., :3])
    out = out.at[..., 3:, :3].set(-so3.hat(ph[..., :3]))
    return out


def pose_se3_to_se2(T):
    """Flatten an SE(3) pose to SE(2) (keep yaw, zero z). Ref: se3_ops.hpp:272.

    Note: the reference computes ``yaw = M_PI / atan2(r10, r00)`` which contradicts
    its own doc comment (``alpha = arctan(r21/r11)``); we implement the standard
    ``yaw = atan2(r10, r00)`` extraction.
    """
    yaw = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    yaw = jnp.where(jnp.isfinite(yaw), yaw, 0.0)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    R = jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, one], -1),
        ],
        axis=-2,
    )
    t = jnp.stack([T[..., 0, 3], T[..., 1, 3], z], axis=-1)
    return make_pose(R, t)


def project_image(x):
    """Perspective division: (..., 3) or (..., 4) -> (..., 2). Ref: se3_ops.hpp:304."""
    return x[..., :2] / x[..., 2:3]


def project_image_df(x):
    """Jacobian of perspective division wrt the 3D point, (..., 3) -> (..., 2, 3).

    Ref: se3_ops.hpp:331 (project_image_df).
    """
    x = jnp.asarray(x)
    z = x[..., 2]
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(z)
    return jnp.stack(
        [
            jnp.stack([inv_z, zero, -x[..., 0] * inv_z2], -1),
            jnp.stack([zero, inv_z, -x[..., 1] * inv_z2], -1),
        ],
        axis=-2,
    )


def to_homogeneous(pts):
    """(..., 3) -> (..., 4)."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def project_object_points(P, wTo, points_o):
    """Project homogeneous object-frame points. Ref: se3_ops.hpp:351.

    P: (..., 3, 4) camera projection; wTo: (..., 4, 4); points_o: (..., N, 4).
    Returns (..., N, 2).
    """
    pts_c = jnp.einsum("...ij,...kj->...ki", P @ wTo, points_o)  # (..., N, 3)
    return project_image(pts_c)


def project_object_points_df_object(P, wTo, points_o, use_left_perturbation):
    """d(projection)/d(object pose twist), (..., N, 2, 6). Ref: se3_ops.hpp:383.

    Left perturbation: dpi/dx @ P @ odot(wTo p); right: dpi/dx @ P @ wTo @ odot(p).
    """
    pts_w = jnp.einsum("...ij,...kj->...ki", wTo, points_o)  # (..., N, 4)
    pts_c = jnp.einsum("...ij,...kj->...ki", P, pts_w)  # (..., N, 3)
    dpi = project_image_df(pts_c)  # (..., N, 2, 3)
    if use_left_perturbation:
        J = jnp.einsum("...ij,...kjl->...kil", P, odot(pts_w))  # (..., N, 3, 6)
    else:
        PT = P @ wTo
        J = jnp.einsum("...ij,...kjl->...kil", PT, odot(points_o))
    return dpi @ J  # (..., N, 2, 6)


def project_object_points_df_camera(P, wTo, cTw, points_o, use_left_perturbation):
    """d(projection)/d(camera pose twist), (..., N, 2, 6). Ref: se3_ops.hpp:431.

    Left: -dpi @ [I|0] cTw odot(wTo p); right: -dpi @ [I|0] odot(cTw wTo p).
    """
    pts_w = jnp.einsum("...ij,...kj->...ki", wTo, points_o)
    pts_c3 = jnp.einsum("...ij,...kj->...ki", P, pts_w)
    dpi = project_image_df(pts_c3)
    sel = jnp.concatenate([jnp.eye(3, dtype=pts_w.dtype), jnp.zeros((3, 1), pts_w.dtype)], axis=-1)
    if use_left_perturbation:
        M = jnp.einsum("ij,...jk->...ik", sel, cTw)  # (..., 3, 4)
        J = jnp.einsum("...ij,...kjl->...kil", M, odot(pts_w))
    else:
        pts_cam4 = jnp.einsum("...ij,...kj->...ki", cTw, pts_w)  # (..., N, 4)
        J = jnp.einsum("ij,...kjl->...kil", sel, odot(pts_cam4))
    return -(dpi @ J)


def get_cam_wrt_imu_se3_jacobian(R_b2c, t_c_b, R_w2c, t_b_w, use_left_perturbation):
    """6x6 d(camera twist)/d(imu clone error). Ref: se3_ops.hpp:531.

    Maps the filter clone error e = [dtheta, dp] (p' = p + dp;
    R' = exp(dtheta) R for the left flag, R exp(dtheta) for the right flag)
    to the camera twist xi_c = [rho, phi] with wTc' = exp(xi_c) wTc (left) /
    wTc exp(xi_c) (right), wTc = wTi @ iTc. Verified against autodiff in
    tests/test_math.py::TestSE3::test_cam_wrt_imu_jacobian.
    """
    R_b2c = jnp.asarray(R_b2c)
    t_c_b = jnp.asarray(t_c_b)
    R_w2c = jnp.asarray(R_w2c)
    t_b_w = jnp.asarray(t_b_w)
    batch = jnp.broadcast_shapes(
        R_b2c.shape[:-2], t_c_b.shape[:-1], R_w2c.shape[:-2], t_b_w.shape[:-1]
    )
    dtype = R_w2c.dtype
    out = jnp.zeros(batch + (6, 6), dtype=dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    if use_left_perturbation:
        out = out.at[..., :3, :3].set(jnp.broadcast_to(so3.hat(t_b_w), batch + (3, 3)))
        out = out.at[..., 3:, :3].set(eye)
        out = out.at[..., :3, 3:].set(eye)
    else:
        out = out.at[..., :3, :3].set(jnp.broadcast_to(-R_b2c @ so3.hat(t_c_b), batch + (3, 3)))
        out = out.at[..., 3:, :3].set(jnp.broadcast_to(R_b2c, batch + (3, 3)))
        out = out.at[..., :3, 3:].set(jnp.broadcast_to(R_w2c, batch + (3, 3)))
    return out


def displacement(T1, T2):
    """((3 - tr(R1^T R2))/2, |t1 - t2|). Ref: se3_ops.hpp:~500 (displacement)."""
    R1, R2 = T1[..., :3, :3], T2[..., :3, :3]
    disp_r = (3.0 - jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1)) / 2.0
    disp_t = jnp.linalg.norm(T1[..., :3, 3] - T2[..., :3, 3], axis=-1)
    return disp_r, disp_t
