"""The front-end tracker: KLT + ORB gate + RANSAC + gridded re-detection.

TPU-native equivalent of ``ImageProcessor::processImage``
(image_processor.cpp:130): a pure pytree state machine. Differences from the
reference's control flow (documented):
 * No FIRST/SECOND/OTHER frame special-casing: tracking of an empty previous
   set is a masked no-op, and detection fills free rows every frame a deficit
   exists, so the first frame is just "track nothing, detect everything".
 * New detections enter the track table immediately instead of being
   validated by one extra frame of tracking (trackNewFeatures,
   image_processor.cpp:823) — the filter requires >= min_track_len
   observations before using a track, so one-frame flukes are inert.
 * Gyro-aided prediction uses the exact relative rotation
   R_p2c = R_b2c exp(-mean_gyro dt) R_b2c^T on normalized coordinates
   (the reference's K R K^-1 homography, image_processor.cpp:270).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..math import so3
from . import orb
from .detect import detect_grid
from .image import build_pyramid, equalize_hist
from .klt import forward_backward_track, prepare_pyramid
from .ransac import ransac_fundamental
from .undistort import normalized_to_pixel, undistort_pixels


class TrackerConfig(NamedTuple):
    height: int = 480
    width: int = 752
    pyramid_levels: int = 3
    patch_size: int = 15
    klt_iters: int = 10
    klt_precision: str = "f32x2"  # "f32x2" (exact) | "bf16" (fast, ~0.5 gray)
    orb_threshold: int = 58  # Hamming gate (image_processor.cpp:463)
    ransac_thresh: float = 3e-5  # squared Sampson, normalized coords
    capacity: int = 200  # max tracked features (max_features_num)
    grid_rows: int = 8
    grid_cols: int = 10
    per_cell: int = 3
    min_distance: float = 20.0
    detect_every: int = 1  # re-detect every Nth frame; 2 = the reference's
    # pub_frequency cadence (findNewFeaturesToBeTracked runs at 10 Hz on
    # 20 Hz frames, image_processor.cpp:197 + config pub_frequency)
    equalize: bool = True
    K: tuple = (458.654, 457.296, 367.215, 248.375)  # fx fy cx cy
    dist_model: str = "radtan"
    dist_coeffs: tuple = (0.0, 0.0, 0.0, 0.0)


class TrackerState(struct.PyTreeNode):
    pyr: tuple  # previous prepared pyramid (tuple of AlignedImage)
    xy: jnp.ndarray  # (N, 2) previous pixel positions
    uvn: jnp.ndarray  # (N, 2) previous normalized coords
    desc: jnp.ndarray  # (N, 8) uint32 descriptors
    fid: jnp.ndarray  # (N,) int32, -1 = free
    t: jnp.ndarray  # previous frame time
    next_id: jnp.ndarray  # int32
    rng: jnp.ndarray  # PRNG key (for RANSAC sampling)

    @classmethod
    def create(cls, tc: TrackerConfig, dtype=jnp.float32, seed: int = 0):
        levels = [
            jnp.zeros((tc.height // (2**l), tc.width // (2**l)), dtype)
            for l in range(tc.pyramid_levels)
        ]
        N = tc.capacity
        return cls(
            pyr=prepare_pyramid(levels, tc.klt_precision),
            xy=jnp.zeros((N, 2), dtype),
            uvn=jnp.zeros((N, 2), dtype),
            desc=jnp.zeros((N, 8), jnp.uint32),
            fid=-jnp.ones((N,), jnp.int32),
            t=jnp.zeros((), dtype),
            next_id=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(seed),
        )


class TrackerOutput(NamedTuple):
    fids: jnp.ndarray  # (N,) int32
    uvs: jnp.ndarray  # (N, 2) normalized, undistorted
    uv_vels: jnp.ndarray  # (N, 2)
    meas_mask: jnp.ndarray  # (N,)


def _predict(tc: TrackerConfig, uvn, R_p2c):
    """Rotation-compensated prediction in normalized coords -> pixels."""
    h = jnp.concatenate([uvn, jnp.ones_like(uvn[..., :1])], axis=-1)
    rot = jnp.einsum("ij,nj->ni", R_p2c, h)
    pred_n = rot[..., :2] / jnp.maximum(rot[..., 2:3], 0.1)
    return normalized_to_pixel(pred_n, tc.K)


def process_frame(tc: TrackerConfig, ts: TrackerState, img, t, mean_gyro, R_b2c,
                  frame_idx=None):
    """One camera frame -> (new TrackerState, TrackerOutput).

    img: (H, W) float32 [0, 255]; mean_gyro: (3,) body rate over the frame gap
    (integrateImuData, image_processor.cpp:226). frame_idx (optional scalar):
    when given and tc.detect_every > 1, re-detection only runs on frames with
    frame_idx % detect_every == 0 (keep it UNBATCHED under vmap so the cond
    stays a real branch, not a select).
    """
    dtype = img.dtype
    if tc.equalize == "clahe":
        from .image import clahe

        img = clahe(img)
    elif tc.equalize:
        img = equalize_hist(img)
    pyr = prepare_pyramid(build_pyramid(img, tc.pyramid_levels),
                          tc.klt_precision)
    N = tc.capacity
    dt = t - ts.t
    have_prev = ts.fid >= 0

    # --- gyro-aided prediction + forward/backward KLT ---
    dR_b = so3.exp(mean_gyro * dt)
    R_p2c = R_b2c @ dR_b.T @ R_b2c.T
    pred_xy = _predict(tc, ts.uvn, R_p2c)
    pred_xy = jnp.where(have_prev[:, None], pred_xy, ts.xy)
    klt = forward_backward_track(
        ts.pyr, pyr, ts.xy, pred_xy, patch=tc.patch_size, iters=tc.klt_iters,
        precision=tc.klt_precision,
    )
    tracked = have_prev & klt.ok

    # --- re-detection candidates (independent of the gates below, so it can
    #     run concurrently; suppression near predicted tracked positions) ---
    def _detect(_):
        return detect_grid(
            img, tc.per_cell, tc.grid_rows, tc.grid_cols,
            occupied_xy=klt.xy, occupied_mask=tracked,
            min_distance=tc.min_distance,
        )

    if tc.detect_every > 1 and frame_idx is not None:
        n_cand = tc.per_cell * tc.grid_rows * tc.grid_cols
        det_xy, det_sc, det_ok = jax.lax.cond(
            frame_idx % tc.detect_every == 0,
            _detect,
            lambda _: (jnp.zeros((n_cand, 2), dtype),
                       jnp.zeros((n_cand,), dtype),
                       jnp.zeros((n_cand,), bool)),
            None,
        )
    else:
        det_xy, det_sc, det_ok = _detect(None)
    C = det_xy.shape[0]
    det_order = jnp.argsort(-det_sc)  # best first
    det_xy_s = det_xy[det_order]
    det_ok_s = det_ok[det_order]

    # --- ORB descriptors: one fused pass over tracked positions + detections
    #     (two separate describe calls double the window-extract fixed cost) ---
    desc_cat = orb.describe(pyr[0], jnp.concatenate([klt.xy, det_xy_s], axis=0))
    # (pyr[0] is the prepared level-0 AlignedImage — describe accepts both)
    new_desc = desc_cat[:N]
    det_desc = desc_cat[N:]
    ham = orb.hamming(ts.desc, new_desc)
    tracked = tracked & (ham <= tc.orb_threshold)

    # --- undistort + RANSAC gate on normalized coords ---
    uvn_all = undistort_pixels(
        jnp.concatenate([klt.xy, det_xy_s], axis=0), tc.K, tc.dist_model, tc.dist_coeffs
    ).astype(dtype)
    uvn_new, det_uvn = uvn_all[:N], uvn_all[N:]
    key, sub = jax.random.split(ts.rng)
    inl, _F = ransac_fundamental(ts.uvn, uvn_new, tracked, sub, thresh=tc.ransac_thresh)
    tracked = tracked & inl

    # --- place detections into free rows ---
    free = ~tracked
    # rank free rows and detections; strongest detections claim free rows
    free_rank = jnp.cumsum(free) - 1
    det_rank = jnp.cumsum(det_ok_s) - 1
    n_free = jnp.sum(free)
    place = det_ok_s & (det_rank < n_free)
    # map detection rank -> row index
    rank_to_row = jnp.zeros((N,), jnp.int32).at[
        jnp.where(free, free_rank, N)
    ].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    target_row = rank_to_row[jnp.clip(det_rank, 0, N - 1)]
    rows = jnp.where(place, target_row, N)

    xy = jnp.where(tracked[:, None], klt.xy, 0.0)
    xy = xy.at[rows].set(det_xy_s, mode="drop")
    uvn = jnp.where(tracked[:, None], uvn_new, 0.0)
    uvn = uvn.at[rows].set(det_uvn, mode="drop")
    new_ids = ts.next_id + jnp.cumsum(place.astype(jnp.int32)) - 1
    fid = jnp.where(tracked, ts.fid, -1)
    fid = fid.at[rows].set(new_ids, mode="drop")
    next_id = ts.next_id + jnp.sum(place).astype(jnp.int32)
    # tracked rows keep their fresh descriptor; placed detections theirs
    desc = jnp.where(tracked[:, None], new_desc, jnp.zeros_like(new_desc))
    desc = desc.at[rows].set(det_desc, mode="drop")

    # velocities for tracked features (feature_msg u_vel/v_vel)
    dt_safe = jnp.maximum(dt, 1e-6)
    vel = jnp.where(tracked[:, None], (uvn - ts.uvn) / dt_safe, 0.0)

    out = TrackerOutput(
        fids=fid, uvs=uvn, uv_vels=vel, meas_mask=fid >= 0
    )
    new_state = ts.replace(
        pyr=pyr, xy=xy, uvn=uvn, desc=desc, fid=fid,
        t=jnp.asarray(t, dtype), next_id=next_id, rng=key,
    )
    return new_state, out
