"""Hamilton quaternions, [x, y, z, w] layout, batched.

TPU-native equivalent of the quaternion helpers in
``include/orcvio/utils/math_utils.hpp:68-226`` (quaternionNormalize,
quaternionMultiplication, smallAngleQuaternion, quaternionToRotation,
rotationToQuaternion, inverseQuaternion). All functions are branchless
(``jnp.where`` / argmax select) so they vmap and jit cleanly; the reference's
``if (max_row == ...)`` ladder becomes a 4-candidate select.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def multiply(q1, q2):
    """Hamilton product q1 * q2, inputs (..., 4) in [x,y,z,w]. Ref: math_utils.hpp:80."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    q = jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )
    return normalize(q)


def inverse(q):
    """Conjugate of a unit quaternion. Ref: math_utils.hpp:278."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def from_small_angle(dtheta):
    """Small-angle rotation vector -> unit quaternion. Ref: math_utils.hpp:104."""
    dq = dtheta * 0.5
    n2 = jnp.sum(dq * dq, axis=-1, keepdims=True)
    w_small = jnp.sqrt(jnp.maximum(1.0 - n2, 0.0))
    q_small = jnp.concatenate([dq, w_small], axis=-1)
    q_big = jnp.concatenate([dq, jnp.ones_like(n2)], axis=-1) / jnp.sqrt(1.0 + n2)
    return jnp.where(n2 <= 1.0, q_small, q_big)


def to_rotation(q):
    """Unit quaternion -> rotation matrix (Hamilton). Ref: math_utils.hpp:162.

    For q representing rotation R, returns R with R @ v rotating v.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def from_rotation(R):
    """Rotation matrix -> unit quaternion [x,y,z,w], w >= 0. Ref: math_utils.hpp:192.

    Shepperd's method, branchless: compute all four candidates, pick by the
    largest pivot. Numerically safe for any rotation.
    """
    R = jnp.asarray(R)
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate pivots: 4*qx^2, 4*qy^2, 4*qz^2, 4*qw^2 (up to +1 offsets)
    qx0 = safe_sqrt(1.0 + 2.0 * r00 - tr) * 0.5
    c0 = jnp.stack([qx0, (r01 + r10) / (4 * qx0), (r02 + r20) / (4 * qx0), (r21 - r12) / (4 * qx0)], -1)
    qy1 = safe_sqrt(1.0 + 2.0 * r11 - tr) * 0.5
    c1 = jnp.stack([(r01 + r10) / (4 * qy1), qy1, (r12 + r21) / (4 * qy1), (r02 - r20) / (4 * qy1)], -1)
    qz2 = safe_sqrt(1.0 + 2.0 * r22 - tr) * 0.5
    c2 = jnp.stack([(r02 + r20) / (4 * qz2), (r12 + r21) / (4 * qz2), qz2, (r10 - r01) / (4 * qz2)], -1)
    qw3 = safe_sqrt(1.0 + tr) * 0.5
    c3 = jnp.stack([(r21 - r12) / (4 * qw3), (r02 - r20) / (4 * qw3), (r10 - r01) / (4 * qw3), qw3], -1)

    score = jnp.stack([r00, r11, r22, tr], axis=-1)
    k = jnp.argmax(score, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, k[..., None, None], axis=-2)[..., 0, :]
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    return normalize(q)
