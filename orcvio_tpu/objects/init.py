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
                          p_init_world=None, trim: bool = True,
                          trim_floor: float = 0.02):
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
    def _med_res(p_world):
        Rg_ = R_c2w[jnp.clip(ct.slot, 0, R_c2w.shape[0] - 1)]
        tg_ = t_c_w[jnp.clip(ct.slot, 0, t_c_w.shape[0] - 1)]
        pc_ = jnp.einsum("ktji,ktj->kti", Rg_, p_world[:, None] - tg_)
        zh = pc_[..., :2] / jnp.maximum(pc_[..., 2:3], 1e-3)
        rr = jnp.linalg.norm(zh - ct.uv, axis=-1)
        return jnp.nanmedian(jnp.where(ct.mask, rr, jnp.nan), axis=1)

    tri = triangulate(cfg, ct, R_c2w, t_c_w)
    valid = tri.valid & (ct.n_obs >= 2)
    if p_init_world is not None:
        # the bbox-lite depth prior rescues degenerate two-view inits but can
        # also steer good tracks into worse minima: solve BOTH ways and keep,
        # per keypoint, the solution that is valid with the lower median
        # reprojection residual (prior is advisory, never authoritative)
        tri_p = triangulate(cfg, ct, R_c2w, t_c_w, p_init_world=p_init_world)
        valid_p = tri_p.valid & (ct.n_obs >= 2)
        m0 = jnp.where(valid, _med_res(tri.p_world), jnp.inf)
        m1 = jnp.where(valid_p, _med_res(tri_p.p_world), jnp.inf)
        take_p = m1 < m0
        tri = tri._replace(
            p_world=jnp.where(take_p[:, None], tri_p.p_world, tri.p_world))
        valid = valid | valid_p
    if not trim:
        return tri.p_world, valid

    # second pass with residual trimming: semantic-keypoint tracks carry
    # identity-swap outliers (CNN label flips) far beyond what the Huber
    # IRLS inside the LM can absorb; drop observations whose reprojection
    # residual exceeds max(3 x per-track median, trim_floor) and re-solve.
    Rg = R_c2w[jnp.clip(ct.slot, 0, R_c2w.shape[0] - 1)]  # (K, T, 3, 3)
    tg = t_c_w[jnp.clip(ct.slot, 0, t_c_w.shape[0] - 1)]
    pc = jnp.einsum("ktji,ktj->kti", Rg, tri.p_world[:, None] - tg)
    z_hat = pc[..., :2] / jnp.maximum(pc[..., 2:3], 1e-3)
    res = jnp.linalg.norm(z_hat - ct.uv, axis=-1)  # (K, T)
    res_m = jnp.where(ct.mask, res, jnp.nan)
    med = jnp.nanmedian(res_m, axis=1)
    thr = jnp.maximum(3.0 * med, trim_floor)[:, None]
    keep = ct.mask & (res < thr)
    ct2 = ct._replace(mask=keep, n_obs=jnp.sum(keep, axis=1).astype(jnp.int32))
    tri2 = triangulate(cfg, ct2, R_c2w, t_c_w, p_init_world=tri.p_world)
    valid2 = tri2.valid & (ct2.n_obs >= 2)
    # fall back to pass-1 where trimming removed too much
    use2 = valid2 & (ct2.n_obs >= jnp.maximum(2, ct.n_obs // 2))
    p_out = jnp.where(use2[:, None], tri2.p_world, tri.p_world)
    return p_out, jnp.where(use2, valid2, valid)


def kabsch_umeyama(src, dst, mask):
    """Similarity transform dst ~ s R src + t. Ref: findTransform (ObjectFeatureInitializer.cpp:267).

    src/dst: (..., N, 3); mask: (..., N). Mirrors the reference's scale
    estimate (ratio of consecutive point distances) and SVD rotation with the
    det sign fix; returns the 4x4 with the scaled rotation embedded, exactly as
    the reference does.
    """
    m = mask[..., None].astype(src.dtype)
    n = jnp.maximum(jnp.sum(mask, axis=-1), 1)[..., None]
    # pairwise-distance scale over ALL valid pairs (the reference's
    # consecutive-pair heuristic, findTransform :280, degenerates to 0/0
    # when the valid set is a scattered subset — e.g. a RANSAC inlier set)
    pair_ok = (mask[..., :, None] & mask[..., None, :])[..., None]
    d_in = jnp.sum(jnp.linalg.norm(
        (src[..., :, None, :] - src[..., None, :, :]) * pair_ok, axis=-1),
        axis=(-1, -2))
    d_out = jnp.sum(jnp.linalg.norm(
        (dst[..., :, None, :] - dst[..., None, :, :]) * pair_ok, axis=-1),
        axis=(-1, -2))
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


def kabsch_ransac(mean_shape, world_kps, valid, inlier_threshold=1.5,
                  min_inliers=3):
    """RANSAC Kabsch over all C(K, 3) triples. Ref: ObjectFeatureInitializer.cpp:120-240.

    mean_shape/world_kps: (K, 3); valid: (K,). Returns (wTq (4, 4), ok).
    Hypotheses containing an invalid keypoint are discarded by masking.

    Deliberate deviation: the reference's inlier distance threshold is 20 m
    (:211) — effectively "all valid points". Our CNN path produces
    identity-swapped keypoint tracks that triangulate to self-consistent
    but METERS-wrong points; an object-scale threshold (~half a car length)
    lets the triple consensus reject them, which no global gate can.
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
    # rank by inlier count, tie-broken by mean inlier distance
    mean_d = jnp.sum(jnp.where(inl, dist, 0.0), axis=1) / jnp.maximum(
        jnp.sum(inl, axis=1), 1)
    scores = jnp.where(hyp_ok, jnp.sum(inl, axis=1) - mean_d / inlier_threshold,
                       -jnp.inf)
    best = jnp.argmax(scores)
    best_inl = inl[best] & valid
    ok = jnp.sum(best_inl) >= min_inliers
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
    # outlier handling is delegated to the object-scale RANSAC consensus
    # below (kabsch_ransac inlier_threshold): identity-swapped tracks
    # triangulate to self-consistent clusters meters from the object that
    # defeat any single global spatial gate
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
