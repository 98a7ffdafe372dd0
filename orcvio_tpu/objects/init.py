"""Object initialization: per-keypoint triangulation + Kabsch/Umeyama fit.

TPU-native equivalent of ``src/obj/ObjectFeatureInitializer.cpp``:
``single_object_initialization`` (:33 — triangulate each semantic keypoint
across frames, then fit the similarity transform from the class mean shape to
the triangulated world keypoints), ``findTransform`` (:267 Kabsch with scale),
and the RANSAC variant over C(N,3) keypoint triples (:120-240). Everything is
batched: all keypoints triangulate simultaneously (reusing the filter's masked
LM triangulation) and all RANSAC hypotheses are solved as one batched SVD.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.core import FilterConfig
from ..filter.tracks import CompactTracks
from ..filter.triangulation import triangulate
from ..math import se3


def triangulate_keypoints(cfg: FilterConfig, zs, zs_mask, R_c2w, t_c_w,
                          p_init_world=None):
    """Triangulate each semantic keypoint across frames.

    zs: (T, K, 2) normalized measurements; zs_mask: (T, K); camera poses
    (T, 3, 3)/(T, 3). Returns (p_world (K, 3), valid (K,)).
    Ref: single_object_initialization keypoint loop
    (ObjectFeatureInitializer.cpp:44-80, via single_triangulation_common).
    """
    T = zs.shape[0]
    K = zs.shape[1]
    # build per-keypoint compact tracks: axis swap puts keypoints as "features"
    uv = jnp.swapaxes(zs, 0, 1)  # (K, T, 2)
    mask = jnp.swapaxes(zs_mask, 0, 1)  # (K, T)
    # compact entries must form a valid-prefix for the anchor logic; object
    # measurements can be ragged over time, so sort valid first (stable keeps
    # temporal order within the valid block)
    order = jnp.argsort(~mask, axis=1, stable=True)
    uv_c = jnp.take_along_axis(uv, order[..., None], axis=1)
    mask_c = jnp.take_along_axis(mask, order, axis=1)
    ct = CompactTracks(
        uv=uv_c,
        uv_vel=jnp.zeros_like(uv_c),
        slot=order.astype(jnp.int32),
        mask=mask_c,
        n_obs=jnp.sum(mask_c, axis=1).astype(jnp.int32),
    )
    tri = triangulate(cfg, ct, R_c2w, t_c_w, p_init_world=p_init_world)
    return tri.p_world, tri.valid & (ct.n_obs >= 2)


def kabsch_umeyama(src, dst, mask):
    """Similarity transform dst ~ s R src + t. Ref: findTransform (ObjectFeatureInitializer.cpp:267).

    src/dst: (..., N, 3); mask: (..., N). Mirrors the reference's scale
    estimate (ratio of consecutive point distances) and SVD rotation with the
    det sign fix; returns the 4x4 with the scaled rotation embedded, exactly as
    the reference does.
    """
    m = mask[..., None].astype(src.dtype)
    n = jnp.maximum(jnp.sum(mask, axis=-1), 1)[..., None]
    # consecutive-distance scale over valid points: use masked consecutive pairs
    pair_ok = (mask[..., 1:] & mask[..., :-1])[..., None]
    d_in = jnp.sum(jnp.linalg.norm((src[..., 1:, :] - src[..., :-1, :]) * pair_ok, axis=-1), axis=-1)
    d_out = jnp.sum(jnp.linalg.norm((dst[..., 1:, :] - dst[..., :-1, :]) * pair_ok, axis=-1), axis=-1)
    scale = d_out / jnp.maximum(d_in, 1e-9)
    dst_s = dst / scale[..., None, None]

    mu_s = jnp.sum(src * m, axis=-2) / n
    mu_d = jnp.sum(dst_s * m, axis=-2) / n
    sc = (src - mu_s[..., None, :]) * m
    dc = (dst_s - mu_d[..., None, :]) * m
    cov = jnp.einsum("...ni,...nj->...ij", sc, dc)  # in * out^T convention
    U, S, Vt = jnp.linalg.svd(cov)
    V = jnp.swapaxes(Vt, -1, -2)
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    D = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), cov.shape).copy()
    D = D.at[..., 2, 2].set(jnp.sign(det))
    R = V @ D @ jnp.swapaxes(U, -1, -2)
    t = scale[..., None] * (mu_d - jnp.einsum("...ij,...j->...i", R, mu_s))
    A = se3.make_pose(scale[..., None, None] * R, t)
    return A


def _combos(n, k=3):
    return np.asarray(list(itertools.combinations(range(n), k)), np.int32)


def kabsch_ransac(mean_shape, world_kps, valid, inlier_threshold=20.0):
    """RANSAC Kabsch over all C(K, 3) triples. Ref: ObjectFeatureInitializer.cpp:120-240.

    mean_shape/world_kps: (K, 3); valid: (K,). Returns (wTq (4, 4), ok).
    Hypotheses containing an invalid keypoint are discarded by masking. The
    reference's inlier distance threshold is 20 m (:211) — effectively "all
    valid points" unless triangulation exploded; mirrored here.
    """
    K = mean_shape.shape[0]
    combos = jnp.asarray(_combos(K))  # (C, 3)
    src = mean_shape[combos]  # (C, 3, 3)
    dst = world_kps[combos]
    hyp_ok = jnp.all(valid[combos], axis=1)
    T_h = kabsch_umeyama(src, dst, jnp.ones(combos.shape, bool))  # (C, 4, 4)
    # inliers per hypothesis over all valid keypoints
    pred = jnp.einsum("cij,kj->cki", T_h[:, :3, :3], mean_shape) + T_h[:, None, :3, 3]
    dist = jnp.linalg.norm(pred - world_kps[None], axis=-1)
    inl = (dist < inlier_threshold) & valid[None, :]
    scores = jnp.where(hyp_ok, jnp.sum(inl, axis=1), -1)
    best = jnp.argmax(scores)
    best_inl = inl[best] & valid
    ok = scores[best] > 3  # max_num_inliers_threshold = 3 (:134)
    # re-fit on the best inlier set
    wTq = kabsch_umeyama(mean_shape, world_kps, best_inl)
    return wTq, ok


def object_initialization(
    cfg: FilterConfig, zs, zs_mask, R_c2w, t_c_w, mean_shape,
    use_ransac=True, estimate_se2=False,
    zb=None, zb_mask=None, shape_ellipsoid=None,
):
    """Full init: triangulate keypoints -> Kabsch (+RANSAC) -> optional SE(2).

    Ref: single_object_initialization (ObjectFeatureInitializer.cpp:33-199).
    Returns (wTq (4,4), success, kps_world (K,3), kps_valid (K,)).

    When per-frame bboxes (zb (T, 4), zb_mask (T,)) and the class ellipsoid
    (shape_ellipsoid (3,)) are given, the bbox-only lite geometry
    (ObjectFeatureInitializer.cpp:497) supplies (a) the initial DEPTH for
    every keypoint's triangulation LM — the two-view guess degenerates for
    low-parallax or identity-swapped semantic tracks — and (b) a coarse
    spatial gate: triangulated keypoints farther than ~3 object radii from
    the bbox-implied center are label-flip/divergence garbage and are
    excluded from the Kabsch fit.
    """
    center_prior = None
    if zb is not None and shape_ellipsoid is not None:
        first = jnp.argmax(zb_mask)
        cTw_R = jnp.swapaxes(R_c2w[first], -1, -2)
        wTq_lite, lite_ok = object_initialization_lite(
            zb[first], cTw_R, t_c_w[first], shape_ellipsoid)
        have = lite_ok & jnp.any(zb_mask)
        center_prior = jnp.where(
            have, wTq_lite[:3, 3], jnp.full((3,), jnp.nan, zs.dtype))
    K = zs.shape[1]
    p_init = (None if center_prior is None
              else jnp.broadcast_to(center_prior, (K, 3)))
    kps_w, kps_valid = triangulate_keypoints(cfg, zs, zs_mask, R_c2w, t_c_w,
                                             p_init_world=p_init)
    if center_prior is not None:
        r_gate = 3.0 * jnp.max(jnp.linalg.norm(mean_shape, axis=-1))
        near = jnp.linalg.norm(kps_w - center_prior, axis=1) < r_gate
        kps_valid = kps_valid & jnp.where(
            jnp.all(jnp.isfinite(center_prior)), near, True)
    enough = jnp.sum(kps_valid) > 3  # num_valid_pts_threshold (:82)
    if use_ransac:
        wTq, ok = kabsch_ransac(mean_shape, kps_w, kps_valid)
    else:
        wTq = kabsch_umeyama(mean_shape, kps_w, kps_valid)
        ok = jnp.ones((), bool)
    if estimate_se2:
        wTq = se3.pose_se3_to_se2(wTq)
    return wTq, enough & ok, kps_w, kps_valid


def object_initialization_lite(zb_first, R_GtoA, p_AinG, mean_shape,
                               bbox_scale=(1.0, 1.0, 1.0), estimate_se2=False):
    """Bbox-only object init from the first observation.

    Ref: single_object_initialization_lite (ObjectFeatureInitializer.cpp:497):
    assume identity object rotation; the depth d along the bbox-center ray is
    set so the mean-shape ellipsoid's projected extent matches the bbox edge
    lines; wPq = d B^{-1} b - camera center, with B = R_GtoA.

    zb_first: (4,) normalized bbox of the first frame; R_GtoA/p_AinG: first
    camera pose. Returns (wTq (4, 4), ok).
    """
    from . import residuals as RS

    dtype = zb_first.dtype
    vv = (mean_shape * jnp.asarray(bbox_scale, dtype)) ** 2
    A = jnp.diag(vv)  # wRq = I
    B = R_GtoA  # K = I (normalized coordinates)
    lines = RS.bbox_lines(zb_first[None])[0]  # (4, 3)
    line_sum = jnp.einsum("ni,nj->ij", lines, lines)
    denominator = jnp.einsum("ni,ij,jk,kl,nl->", lines, B, A, B.T, lines)
    E = B.T @ line_sum @ B / jnp.maximum(denominator, 1e-12)
    center = jnp.asarray(
        [(zb_first[0] + zb_first[2]) / 2, (zb_first[1] + zb_first[3]) / 2, 1.0], dtype
    )
    Binv = jnp.linalg.inv(B)
    q = center @ Binv.T @ E @ Binv @ center
    d = 1.0 / jnp.sqrt(jnp.maximum(q, 1e-12))
    cPw = -R_GtoA @ p_AinG
    wPq = d * Binv @ center - R_GtoA.T @ cPw
    wTq = jnp.eye(4, dtype=dtype).at[:3, 3].set(wPq)
    if estimate_se2:
        wTq = se3.pose_se3_to_se2(wTq)
    ok = jnp.all(jnp.isfinite(wPq)) & (q > 1e-12)
    return wTq, ok
