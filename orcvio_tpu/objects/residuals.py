"""Object-level residual blocks and analytic Jacobians.

TPU-native equivalent of the reference's object LM functors
(``src/obj/ObjectLM.cpp``: ErrorFeatureQuadric :272, ErrorBBoxQuadric :443
with ``ellipse_from_shape`` :407 / ``bbox2poly`` :380 / ``poly2lineh`` :394,
ErrorDeformRegularization / ErrorQuadVRegularization ObjectLM.h:463-515,
Huber :823) and their camera-pose Jacobians (``src/obj/ObjectResJacCam.cpp``).

All functions operate on one object over a fixed-capacity frame window with
masks: zs (T, K, 2) keypoint measurements (mask zs_mask), zb (T, 4) bboxes
(mask zb_mask), camera poses cTw (T, 4, 4). The reference's per-frame dynamic
"valid lists" become masked rows whose residuals/Jacobians are exact zeros.

Object state: wTo (4, 4), shape (3,) ellipsoid semi-axes, kps_o (K, 3)
semantic keypoints in the object frame. Error-state DoF = 6 + 3 + 3K with
layout [pose twist | shape | kp_0 | ... | kp_{K-1}] (ObjectLM.h:117).

Residual sign convention matches the reference: prediction - measurement.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..math import se3, so3


def ellipse_from_shape(shape):
    """Dual quadric of the ellipsoid: diag(a^2, b^2, c^2, -1). Ref: ObjectLM.cpp:407."""
    v = jnp.concatenate([shape * shape, -jnp.ones_like(shape[:1])])
    return jnp.zeros((4, 4), shape.dtype).at[jnp.arange(4), jnp.arange(4)].set(v)


def bbox2poly(bbox):
    """(..., 4) xmin,ymin,xmax,ymax -> (..., 4, 2) corners. Ref: ObjectLM.cpp:380."""
    xmin, ymin, xmax, ymax = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    return jnp.stack(
        [
            jnp.stack([xmin, ymin], -1),
            jnp.stack([xmax, ymin], -1),
            jnp.stack([xmax, ymax], -1),
            jnp.stack([xmin, ymax], -1),
        ],
        axis=-2,
    )


def poly2lineh(points):
    """Polygon corners (..., N, 2) -> homogeneous edge lines (..., N, 3).

    Ref: ObjectLM.cpp:394 (cross of consecutive homogeneous corners).
    """
    ph = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    nxt = jnp.roll(ph, -1, axis=-2)
    return jnp.cross(ph, nxt)


def bbox_lines(zb):
    """(..., 4) bbox -> (..., 4, 3) edge lines."""
    return poly2lineh(bbox2poly(zb))


# ---------------------------------------------------------------------------
# Feature (keypoint reprojection) block
# ---------------------------------------------------------------------------

def feature_residual(wTo, kps_o, cTw, zs, zs_mask):
    """r[t, k] = project([I|0] cTw wTo kp_k) - zs[t, k], masked. Ref: ObjectLM.cpp:272."""
    T = cTw.shape[0]
    K = kps_o.shape[0]
    kps_h = jnp.broadcast_to(se3.to_homogeneous(kps_o), (T, K, 4))
    P = cTw[..., :3, :]  # (T, 3, 4) (intrinsics = I: normalized coords)
    uv = se3.project_object_points(P, wTo, kps_h)  # (T, K, 2)
    r = uv - zs
    return jnp.where(zs_mask[..., None], r, 0.0)


def feature_jacobians(wTo, kps_o, cTw, zs_mask, use_left):
    """(J_pose (T,K,2,6), J_kp (T,K,2,3), J_cam (T,K,2,6)). Ref: ObjectLM.cpp:318, ObjectResJacCam.cpp:228."""
    T = cTw.shape[0]
    K = kps_o.shape[0]
    kps_h = jnp.broadcast_to(se3.to_homogeneous(kps_o), (T, K, 4))
    P = cTw[..., :3, :]  # (T, 3, 4)
    J_pose = se3.project_object_points_df_object(P, wTo, kps_h, use_left)  # (T, K, 2, 6)
    # keypoint jacobian: dpi(P wTo kp) @ (P wTo)[:, :3]  (ObjectLM.cpp:344)
    PT = jnp.einsum("tij,jk->tik", P, wTo)  # (T, 3, 4)
    pc = jnp.einsum("tij,tkj->tki", PT, kps_h)  # (T, K, 3)
    dpi = se3.project_image_df(pc)  # (T, K, 2, 3)
    J_kp = dpi @ PT[:, None, :, :3]
    J_cam = se3.project_object_points_df_camera(P, wTo, cTw, kps_h, use_left)
    m = zs_mask[..., None, None]
    return jnp.where(m, J_pose, 0.0), jnp.where(m, J_kp, 0.0), jnp.where(m, J_cam, 0.0)


# ---------------------------------------------------------------------------
# BBox (quadric tangency) block
# ---------------------------------------------------------------------------

def bbox_residual(wTo, shape, cTw, zb, zb_mask, use_new):
    """Per-frame 4-line residual (T, 4), masked. Ref: ObjectLM.cpp:443-486."""
    Qi = ellipse_from_shape(shape)
    lines = bbox_lines(zb)  # (T, 4, 3)
    P_o = jnp.einsum("tij,jk->tik", cTw[..., :3, :], wTo)  # (T, 3, 4)
    if not use_new:
        Ci = jnp.einsum("tij,jk,tlk->til", P_o, Qi, P_o)  # (T, 3, 3)
        r = jnp.einsum("tni,tij,tnj->tn", lines, Ci, lines)
    else:
        uline_b = jnp.einsum("tji,tnj->tni", P_o, lines)  # (T, 4lines, 4)
        b = uline_b[..., :3]
        bh = uline_b[..., 3]
        U2 = Qi[:3, :3]
        bU2b = jnp.einsum("tni,ij,tnj->tn", b, U2, b)
        sqrt_bU2b = jnp.sqrt(jnp.maximum(bU2b, 1e-12))
        sign = jnp.where(bh > 0, 1.0, -1.0)
        bnorm = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-12)
        r = (bh - sign * sqrt_bU2b) / bnorm
    return jnp.where(zb_mask[:, None], r, 0.0)


def bbox_jacobians(wTo, shape, cTw, zb, zb_mask, use_left, use_new):
    """(J_pose (T,4,6), J_shape (T,4,3), J_cam (T,4,6)). Ref: ObjectLM.cpp:503-613, ObjectResJacCam.cpp:396."""
    dtype = wTo.dtype
    Qi = ellipse_from_shape(shape)
    lines = bbox_lines(zb)  # (T, L, 3)
    P = cTw[..., :3, :]  # (T, 3, 4)
    P_prime = jnp.eye(4, dtype=dtype)[:3]  # (3, 4)
    yyw = jnp.einsum("tnl,tlj->tnj", lines, P)  # (T, L, 4)
    yyw_prime = jnp.einsum("tnl,lj->tnj", lines, P_prime)  # (T, L, 4)
    yyo = jnp.einsum("tnj,jk->tnk", yyw, wTo)  # (T, L, 4)

    if not use_new:
        # old residual: e = yyo Qi yyo^T
        if use_left:
            # p_eb_p_oxi = 2 yyo Qi wTo^T circledCirc(yyw)^T  (ObjectLM.cpp:540)
            cc = se3.circled_circ(yyw)  # (T, L, 6, 4)
            v = jnp.einsum("tnj,jk->tnk", yyo, Qi)  # (T, L, 4)
            vw = jnp.einsum("tnk,jk->tnj", v, wTo)  # v @ wTo^T -> (T, L, 4)
            J_pose = 2.0 * jnp.einsum("tnj,tnqj->tnq", vw, cc)  # (T, L, 6)
        else:
            arg = jnp.einsum("kj,tnj->tnk", wTo.T, yyw)  # wTo^T yyw
            cc = se3.circled_circ(arg)  # (T, L, 6, 4)
            v = jnp.einsum("tnj,jk->tnk", yyo, Qi)
            J_pose = 2.0 * jnp.einsum("tnj,tnqj->tnq", v, cc)
        # shape jacobian: 2 * shape .* (yyo[:3])^2  (ObjectLM.cpp:567)
        J_shape = 2.0 * shape[None, None, :] * (yyo[..., :3] ** 2)
        # camera jacobian (ObjectResJacCam.cpp:424-439)
        if use_left:
            J_cam = -J_pose
        else:
            ccp = se3.circled_circ(yyw_prime)  # (T, L, 6, 4)
            vv = jnp.einsum("tnj,jk->tnk", yyo, Qi)  # (T, L, 4)
            vw = jnp.einsum("tnk,jk->tnj", vv, wTo)  # @ wTo^T
            vwc = jnp.einsum("tnj,tkj->tnk", vw, cTw)  # @ cTw^T (ObjectResJacCam.cpp:438)
            J_cam = -2.0 * jnp.einsum("tnj,tnqj->tnq", vwc, ccp)
    else:
        uline_b = jnp.einsum("tji,tnj->tni", jnp.einsum("tij,jk->tik", P, wTo), lines)
        b = uline_b[..., :3]
        bh = uline_b[..., 3]
        U2 = Qi[:3, :3]
        bU2b = jnp.einsum("tni,ij,tnj->tn", b, U2, b)
        sqrt_bU2b = jnp.sqrt(jnp.maximum(bU2b, 1e-12))[..., None]
        sign = jnp.where(bh > 0, 1.0, -1.0)[..., None]
        bnorm = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-12)[..., None]
        # d e / d uline_b  (1x4): term1a - sign * uline_b^T term2a / sqrt
        term1a = jnp.zeros((4,), dtype).at[3].set(1.0)
        term2a = Qi.at[3, 3].set(0.0)
        p_be_p_ulinea = term1a[None, None] - sign * jnp.einsum("tnj,jk->tnk", uline_b, term2a) / sqrt_bU2b
        # d (normalized) / d uline_b (4x4)
        eye_t = jnp.eye(4, dtype=dtype).at[3, 3].set(0.0)
        p_ulinea_ulineb = (
            jnp.eye(4, dtype=dtype)[None, None] / bnorm[..., None]
            - jnp.einsum("tni,tnj->tnij", uline_b, uline_b) @ eye_t / (bnorm[..., None] ** 3)
        )
        if use_left:
            cc = se3.circled_circ(yyw)  # (T, L, 6, 4)
            p_ulineb_p_oxi = jnp.einsum("kj,tnqk->tnjq", wTo, cc)  # wTo^T cc^T: (T, L, 4, 6)
            p_ulineb_p_cxi = p_ulineb_p_oxi
        else:
            arg = jnp.einsum("kj,tnj->tnk", wTo.T, yyw)
            cc = se3.circled_circ(arg)
            p_ulineb_p_oxi = jnp.einsum("tnqk->tnkq", cc)
            ccp = se3.circled_circ(yyw_prime)
            # wTo^T cTw^T cc^T (ObjectResJacCam.cpp:466)
            p_ulineb_p_cxi = jnp.einsum("kj,tlk,tnql->tnjq", wTo, cTw, ccp)
        dd = jnp.einsum("tnk,tnkj->tnj", p_be_p_ulinea, p_ulinea_ulineb)  # (T, L, 4)
        J_pose = jnp.einsum("tnj,tnjq->tnq", dd, p_ulineb_p_oxi)
        J_cam = -jnp.einsum("tnj,tnjq->tnq", dd, p_ulineb_p_cxi)
        # shape jacobian. NOTE — deliberate deviation: the reference
        # (ObjectLM.cpp:605) omits the -sign(bh) factor; the true derivative of
        # e = (bh - sign sqrt(b^T U^2 b))/|b| wrt the semi-axes carries it
        # (autodiff-verified in tests/test_objects_golden.py).
        J_shape = -sign * (shape[None, None, :] * b * b) / (bnorm * sqrt_bU2b)

    m = zb_mask[:, None, None]
    return (
        jnp.where(m, J_pose, 0.0),
        jnp.where(m, J_shape, 0.0),
        jnp.where(m, J_cam, 0.0),
    )


# ---------------------------------------------------------------------------
# Regularization blocks
# ---------------------------------------------------------------------------

def deform_residual(kps_o, kps_mean, frame_mask):
    """r[t, k] = kps[k] - mean[k] per observed frame. Ref: ObjectLM.h:463."""
    r = (kps_o - kps_mean)[None, :, :] * jnp.ones_like(frame_mask, kps_o.dtype)[:, None, None]
    return jnp.where(frame_mask[:, None, None], r, 0.0)


def shape_residual(shape, shape_mean, frame_mask):
    """r[t] = shape - mean per observed frame. Ref: ObjectLM.h:498."""
    r = (shape - shape_mean)[None, :] * jnp.ones_like(frame_mask, shape.dtype)[:, None]
    return jnp.where(frame_mask[:, None], r, 0.0)


# ---------------------------------------------------------------------------
# Huber (reference flavor: applied to the stacked raw residual)
# ---------------------------------------------------------------------------

def huber_apply(x, eps):
    """fvec map (ObjectLM.cpp:823): x if x < eps^2 else 2 eps sqrt(x) - eps^2."""
    import math

    if math.isinf(eps):
        return x
    k2 = eps * eps
    return jnp.where(x < k2, x, 2.0 * eps * jnp.sqrt(jnp.maximum(x, 1e-18)) - k2)


def huber_jac_scale(x, eps):
    """Row scale for the Jacobian (ObjectLM.cpp:845)."""
    import math

    if math.isinf(eps):
        return jnp.ones_like(x)
    k2 = eps * eps
    return jnp.where(x < k2, 1.0, eps / jnp.sqrt(jnp.maximum(x, 1e-18)))
