"""Object-level Levenberg-Marquardt over {pose, shape, keypoints}.

TPU-native equivalent of the reference's vendored MINPACK LM
(``include/orcvio/utils/EigenLevenbergMarquardt/``) driving ``ObjectLM``
(full: DoF 6+3+3K, four residual blocks) and ``ObjectLMLite`` (DoF 9, bbox
only) — see ``single_levenberg_marquardt[_lite]``
(ObjectFeatureInitializer.cpp:343-500). Instead of the adaptive trust-region
machinery we run a fixed budget of damped normal-equation steps with
accept/reject per object (the same fixed point; jit/vmap-friendly), with the
left-multiplicative retraction the reference uses for its SE(3) block
(ObjectLM.cpp:63-70; NB the reference always retracts left even when the
Jacobians use the right-perturbation flag — we keep retraction consistent
with the flag instead).

Also exports the pieces the EKF object update consumes: stacked
feature+bbox residuals and their Jacobians wrt the object state and wrt each
camera pose (fvec_all / fjac_object_state_all / fjac_sensor_state_all,
ObjectFeatureInitializer.h:100-110).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import se3
from . import residuals as R


class ObjectLMConfig(NamedTuple):
    iters: int = 20
    init_lambda: float = 1e-4
    residual_weights: tuple = (1.0, 1.0, 1.0, 1.0)  # feature, bbox, deform, shape_reg
    huber_epsilon: float = float("inf")
    use_left_perturbation: bool = True
    use_new_bbox_residual: bool = False
    lite: bool = False  # bbox-only, state = {pose, shape} (ObjectLMLite)


class ObjectLMState(NamedTuple):
    wTo: jnp.ndarray  # (4, 4)
    shape: jnp.ndarray  # (3,)
    kps: jnp.ndarray  # (K, 3)


class ObjectLMData(NamedTuple):
    cTw: jnp.ndarray  # (T, 4, 4)
    zs: jnp.ndarray  # (T, K, 2)
    zs_mask: jnp.ndarray  # (T, K)
    zb: jnp.ndarray  # (T, 4)
    zb_mask: jnp.ndarray  # (T,)
    frame_mask: jnp.ndarray  # (T,) frames where the object is observed
    kps_mean: jnp.ndarray  # (K, 3)
    shape_mean: jnp.ndarray  # (3,)


def residual_stack(cfg: ObjectLMConfig, st: ObjectLMState, d: ObjectLMData):
    """Weighted stacked residual [feature; bbox; deform; shape_reg] + huber."""
    w = cfg.residual_weights
    rf = R.feature_residual(st.wTo, st.kps, d.cTw, d.zs, d.zs_mask).reshape(-1) * w[0]
    rb = R.bbox_residual(st.wTo, st.shape, d.cTw, d.zb, d.zb_mask, cfg.use_new_bbox_residual).reshape(-1) * w[1]
    if cfg.lite:
        r = jnp.concatenate([rb])
    else:
        rd = R.deform_residual(st.kps, d.kps_mean, d.frame_mask).reshape(-1) * w[2]
        rs = R.shape_residual(st.shape, d.shape_mean, d.frame_mask).reshape(-1) * w[3]
        r = jnp.concatenate([rf, rb, rd, rs])
    return R.huber_apply(r, cfg.huber_epsilon)


def jacobian_stack(cfg: ObjectLMConfig, st: ObjectLMState, d: ObjectLMData):
    """Weighted stacked Jacobian wrt the object error state.

    Full: columns [pose(6) | shape(3) | kp0..kpK-1 (3K)]; lite: [pose | shape].
    """
    T, K = d.zs_mask.shape
    dof = 9 + (0 if cfg.lite else 3 * K)
    w = cfg.residual_weights

    Jp_b, Js_b, _ = R.bbox_jacobians(
        st.wTo, st.shape, d.cTw, d.zb, d.zb_mask,
        cfg.use_left_perturbation, cfg.use_new_bbox_residual,
    )
    Jb = jnp.zeros((T * 4, dof), st.wTo.dtype)
    Jb = Jb.at[:, :6].set(Jp_b.reshape(-1, 6))
    Jb = Jb.at[:, 6:9].set(Js_b.reshape(-1, 3))
    Jb = Jb * w[1]

    if cfg.lite:
        raw = residual_stack(cfg._replace(huber_epsilon=float("inf")), st, d)
        return Jb * R.huber_jac_scale(raw, cfg.huber_epsilon)[:, None]

    Jp_f, Jk_f, _ = R.feature_jacobians(st.wTo, st.kps, d.cTw, d.zs_mask, cfg.use_left_perturbation)
    Jf = jnp.zeros((T, K, 2, dof), st.wTo.dtype)
    Jf = Jf.at[..., :6].set(Jp_f)
    kp_cols = 9 + 3 * jnp.arange(K)[None, :, None, None] + jnp.arange(3)[None, None, None, :]
    t_i = jnp.arange(T)[:, None, None, None]
    k_i = jnp.arange(K)[None, :, None, None]
    r_i = jnp.arange(2)[None, None, :, None]
    Jf = Jf.at[t_i, k_i, r_i, kp_cols].set(Jk_f)
    Jf = Jf.reshape(T * K * 2, dof) * w[0]

    # deform: identity blocks on kp columns per frame (ObjectLM.h:463)
    Jd_frame = jnp.zeros((K * 3, dof), st.wTo.dtype).at[:, 9:].set(jnp.eye(3 * K, dtype=st.wTo.dtype))
    Jd = (jnp.broadcast_to(Jd_frame, (T, K * 3, dof)) * d.frame_mask[:, None, None]).reshape(-1, dof) * w[2]
    # shape reg: identity on shape columns per frame
    Js_frame = jnp.zeros((3, dof), st.wTo.dtype).at[:, 6:9].set(jnp.eye(3, dtype=st.wTo.dtype))
    Jsr = (jnp.broadcast_to(Js_frame, (T, 3, dof)) * d.frame_mask[:, None, None]).reshape(-1, dof) * w[3]

    J = jnp.concatenate([Jf, Jb, Jd, Jsr], axis=0)
    # huber row scaling on the raw (pre-huber) residual
    raw = residual_stack(cfg._replace(huber_epsilon=float("inf")), st, d)
    return J * R.huber_jac_scale(raw, cfg.huber_epsilon)[:, None]


def retract(cfg: ObjectLMConfig, st: ObjectLMState, dx):
    """Apply an error-state step (LMObjectState operator+, ObjectLM.cpp:211)."""
    dxi = dx[:6]
    dT = se3.exp(dxi)
    wTo = dT @ st.wTo if cfg.use_left_perturbation else st.wTo @ dT
    shape = st.shape + dx[6:9]
    if cfg.lite:
        return st._replace(wTo=wTo, shape=shape)
    K = st.kps.shape[0]
    kps = st.kps + dx[9 : 9 + 3 * K].reshape(K, 3)
    return st._replace(wTo=wTo, shape=shape, kps=kps)


def optimize(cfg: ObjectLMConfig, st0: ObjectLMState, d: ObjectLMData):
    """Fixed-iteration damped LM. Returns (state, final_cost, accepted_steps)."""
    dof = 9 + (0 if cfg.lite else 3 * st0.kps.shape[0])

    def cost_of(st):
        r = residual_stack(cfg, st, d)
        return jnp.sum(r * r)

    def step(carry, _):
        st, lam, cost = carry
        r = residual_stack(cfg, st, d)
        J = jacobian_stack(cfg, st, d)
        A = J.T @ J
        g = J.T @ r
        delta = jnp.linalg.solve(A + lam * jnp.eye(dof, dtype=r.dtype), g)
        st_new = retract(cfg, st, -delta)
        cost_new = cost_of(st_new)
        accept = cost_new < cost
        st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), st_new, st)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 10.0, 1e-12), jnp.minimum(lam * 10.0, 1e10))
        return (st, lam, cost), accept

    (st, lam, cost), accepts = jax.lax.scan(
        step, (st0, jnp.asarray(cfg.init_lambda, st0.wTo.dtype), cost_of(st0)), None,
        length=cfg.iters,
    )
    return st, cost, jnp.sum(accepts)


class EkfExport(NamedTuple):
    """What the EKF camera-pose update consumes (ObjectFeatureInitializer.h:100)."""

    r_feat: jnp.ndarray  # (T, K, 2)
    r_bbox: jnp.ndarray  # (T, 4)
    J_obj_feat: jnp.ndarray  # (T, K, 2, dof)
    J_obj_bbox: jnp.ndarray  # (T, 4, dof)
    J_cam_feat: jnp.ndarray  # (T, K, 2, 6)
    J_cam_bbox: jnp.ndarray  # (T, 4, 6)
    zs_mask: jnp.ndarray  # (T, K)
    zb_mask: jnp.ndarray  # (T,)


def export_for_update(cfg: ObjectLMConfig, st: ObjectLMState, d: ObjectLMData) -> EkfExport:
    """Residuals + Jacobians (object & camera) of the feature/bbox blocks only.

    Ref: single_levenberg_marquardt export (ObjectFeatureInitializer.cpp:395-435,
    keeping residual_size_to_keep = feature+bbox rows).
    """
    K = st.kps.shape[0]
    w = cfg.residual_weights
    r_feat = R.feature_residual(st.wTo, st.kps, d.cTw, d.zs, d.zs_mask) * w[0]
    r_bbox = R.bbox_residual(st.wTo, st.shape, d.cTw, d.zb, d.zb_mask, cfg.use_new_bbox_residual) * w[1]
    Jp_f, Jk_f, Jc_f = R.feature_jacobians(st.wTo, st.kps, d.cTw, d.zs_mask, cfg.use_left_perturbation)
    Jp_b, Js_b, Jc_b = R.bbox_jacobians(
        st.wTo, st.shape, d.cTw, d.zb, d.zb_mask,
        cfg.use_left_perturbation, cfg.use_new_bbox_residual,
    )
    T = d.cTw.shape[0]
    dof = 9 + 3 * K
    J_obj_feat = jnp.zeros(Jp_f.shape[:-1] + (dof,), st.wTo.dtype)
    J_obj_feat = J_obj_feat.at[..., :6].set(Jp_f)
    kp_cols = 9 + 3 * jnp.arange(K)[None, :, None, None] + jnp.arange(3)[None, None, None, :]
    t_i = jnp.arange(T)[:, None, None, None]
    k_i = jnp.arange(K)[None, :, None, None]
    r_i = jnp.arange(2)[None, None, :, None]
    J_obj_feat = J_obj_feat.at[t_i, k_i, r_i, kp_cols].set(Jk_f)
    J_obj_bbox = jnp.zeros((T, 4, dof), st.wTo.dtype)
    J_obj_bbox = J_obj_bbox.at[..., :6].set(Jp_b)
    J_obj_bbox = J_obj_bbox.at[..., 6:9].set(Js_b)
    return EkfExport(
        r_feat=r_feat,
        r_bbox=r_bbox,
        J_obj_feat=J_obj_feat * w[0],
        J_obj_bbox=J_obj_bbox * w[1],
        J_cam_feat=Jc_f * w[0],
        J_cam_bbox=Jc_b * w[1],
        zs_mask=d.zs_mask,
        zb_mask=d.zb_mask,
    )
