"""SORT multi-object 2D bbox tracking with batched auction assignment.

TPU-native equivalent of ``ros_wrapper/src/sort_ros/src/sort_tracking.cpp``
(IoU cost matrix + Hungarian assignment ``Hungarian.cpp`` + per-box KF +
track lifecycle with max_age/min_hits/lost flags): the sequential Hungarian
solver is replaced by a fixed-iteration auction algorithm (Bertsekas) — a
batched, jit-friendly assignment that converges to the optimal matching for
epsilon below the price resolution; track slots are a fixed-capacity table
with masks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .kf import Kf7State, bbox_to_z, kf7_init, kf7_predict, kf7_update, z_to_bbox


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU: (N, 4) x (M, 4) -> (N, M). Boxes xmin,ymin,xmax,ymax."""
    ax1, ay1, ax2, ay2 = [boxes_a[:, i, None] for i in range(4)]
    bx1, by1, bx2, by2 = [boxes_b[None, :, i] for i in range(4)]
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = jnp.maximum((ax2 - ax1) * (ay2 - ay1), 0.0)
    area_b = jnp.maximum((bx2 - bx1) * (by2 - by1), 0.0)
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9)


def auction_assign(benefit, valid_rows, valid_cols, iters=200, eps=1e-3):
    """Maximize sum of benefits with an auction over rows (trackers bid for
    detections). benefit: (N, M). Returns row_to_col (N,) with -1 = unassigned.

    Invalid rows/cols never assign (benefit -inf). Fixed iteration count keeps
    it jit-static; for IoU benefits in [0,1] and eps=1e-3 this is effectively
    optimal.
    """
    N, M = benefit.shape
    neg = -1e9
    b = jnp.where(valid_rows[:, None] & valid_cols[None, :], benefit, neg)

    def body(carry, _):
        prices, owner = carry  # prices (M,), owner (M,) = row owning col, -1 free
        # unassigned valid rows bid
        assigned = jnp.zeros((N,), bool).at[jnp.where(owner >= 0, owner, N)].set(True, mode="drop")
        need = valid_rows & ~assigned
        value = b - prices[None, :]  # (N, M)
        best_col = jnp.argmax(value, axis=1)
        best_val = jnp.max(value, axis=1)
        # second best for bid increment
        masked = value.at[jnp.arange(N), best_col].set(neg)
        second_val = jnp.max(masked, axis=1)
        bid = best_val - second_val + eps
        # among rows bidding for the same column, the highest bid wins:
        # scatter-max over columns
        bid_eff = jnp.where(need & (best_val > neg / 2), bid, -jnp.inf)
        col_bid = jnp.full((M,), -jnp.inf).at[best_col].max(bid_eff, mode="drop")
        winner_mask = bid_eff == col_bid[best_col]
        winner_rows = jnp.where(winner_mask & need, jnp.arange(N), N)
        # one winner per column (lowest row id wins ties)
        win_row_per_col = jnp.full((M,), N, jnp.int32).at[best_col].min(
            winner_rows.astype(jnp.int32), mode="drop"
        )
        col_updated = win_row_per_col < N
        prices = jnp.where(col_updated, prices + jnp.maximum(col_bid, 0.0), prices)
        owner = jnp.where(col_updated, win_row_per_col, owner)
        return (prices, owner), None

    prices0 = jnp.zeros((M,))
    owner0 = jnp.full((M,), -1, jnp.int32)
    (prices, owner), _ = jax.lax.scan(body, (prices0, owner0), None, length=iters)
    row_to_col = jnp.full((N,), -1, jnp.int32).at[jnp.where(owner >= 0, owner, N)].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop"
    )
    # drop assignments whose benefit is the invalid sentinel
    got = row_to_col >= 0
    bval = b[jnp.arange(N), jnp.clip(row_to_col, 0, M - 1)]
    return jnp.where(got & (bval > neg / 2), row_to_col, -1)


class SortConfig(NamedTuple):
    capacity: int = 16  # max simultaneous tracks
    max_age: int = 2  # frames without a match before a track dies (sort_tracking.cpp)
    min_hits: int = 3  # matches before a track is reported
    iou_threshold: float = 0.3
    max_track_frames: int = 10**9  # force-finish threshold (max_object_feature_track_length)


class SortState(struct.PyTreeNode):
    kf: Kf7State  # batched (C,)
    track_id: jnp.ndarray  # (C,) int32, -1 free
    class_id: jnp.ndarray  # (C,) int32
    hits: jnp.ndarray  # (C,)
    age: jnp.ndarray  # (C,) frames since last match
    frames: jnp.ndarray  # (C,) total frames tracked
    next_id: jnp.ndarray  # int32

    @classmethod
    def create(cls, sc: SortConfig, dtype=jnp.float32):
        C = sc.capacity
        return cls(
            kf=Kf7State(x=jnp.zeros((C, 7), dtype), P=jnp.tile(jnp.eye(7, dtype=dtype), (C, 1, 1))),
            track_id=-jnp.ones((C,), jnp.int32),
            class_id=-jnp.ones((C,), jnp.int32),
            hits=jnp.zeros((C,), jnp.int32),
            age=jnp.zeros((C,), jnp.int32),
            frames=jnp.zeros((C,), jnp.int32),
            next_id=jnp.zeros((), jnp.int32),
        )


class SortOutput(NamedTuple):
    bboxes: jnp.ndarray  # (C, 4) current track boxes
    track_id: jnp.ndarray  # (C,)
    class_id: jnp.ndarray  # (C,)
    reported: jnp.ndarray  # (C,) bool — track confirmed (hits >= min_hits)
    lost: jnp.ndarray  # (C,) bool — track died this frame (lost_flag)
    lost_id: jnp.ndarray  # (C,) int32 — id of the track that died (else -1)


def sort_step(sc: SortConfig, s: SortState, det_boxes, det_class, det_valid):
    """One SORT frame. Ref: sort_tracking.cpp:62-225.

    det_boxes: (M, 4); det_class: (M,); det_valid: (M,).
    """
    C = s.track_id.shape[0]
    live = s.track_id >= 0
    kf_pred = kf7_predict(s.kf)
    pred_boxes = z_to_bbox(kf_pred.x[..., :4])

    iou = iou_matrix(pred_boxes, det_boxes)
    # class consistency: only match same-class detections
    same_class = (s.class_id[:, None] == det_class[None, :]) | (s.class_id[:, None] < 0)
    benefit = jnp.where(same_class, iou, 0.0)
    row_to_col = auction_assign(benefit, live, det_valid)
    matched_iou = benefit[jnp.arange(C), jnp.clip(row_to_col, 0, benefit.shape[1] - 1)]
    matched = (row_to_col >= 0) & (matched_iou >= sc.iou_threshold) & live

    det_idx = jnp.clip(row_to_col, 0, det_boxes.shape[0] - 1)
    kf_new = kf7_update(kf_pred, det_boxes[det_idx], matched)

    hits = jnp.where(matched, s.hits + 1, s.hits)
    age = jnp.where(matched, 0, s.age + 1)
    frames = jnp.where(live, s.frames + 1, 0)
    died = live & ((age > sc.max_age) | (frames >= sc.max_track_frames))

    # free dead slots
    track_id = jnp.where(died, -1, s.track_id)
    live2 = track_id >= 0

    # new tracks for unmatched detections
    det_taken = jnp.zeros((det_boxes.shape[0],), bool).at[
        jnp.where(matched, row_to_col, det_boxes.shape[0])
    ].set(True, mode="drop")
    det_new = det_valid & ~det_taken
    free = ~live2
    free_rank = jnp.cumsum(free) - 1
    new_rank = jnp.cumsum(det_new) - 1
    n_free = jnp.sum(free)
    can = det_new & (new_rank < n_free)
    rank_to_slot = jnp.zeros((C,), jnp.int32).at[jnp.where(free, free_rank, C)].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop"
    )
    slot_of_det = rank_to_slot[jnp.clip(new_rank, 0, C - 1)]
    slots = jnp.where(can, slot_of_det, C)

    init_kf = kf7_init(det_boxes, dtype=s.kf.x.dtype)
    kf_x = kf_new.x.at[slots].set(init_kf.x, mode="drop")
    kf_P = kf_new.P.at[slots].set(init_kf.P, mode="drop")
    new_ids = s.next_id + jnp.cumsum(can.astype(jnp.int32)) - 1
    track_id = track_id.at[slots].set(new_ids, mode="drop")
    class_id = s.class_id.at[slots].set(det_class, mode="drop")
    hits = hits.at[slots].set(1, mode="drop")
    age = age.at[slots].set(0, mode="drop")
    frames = frames.at[slots].set(1, mode="drop")

    out = SortOutput(
        bboxes=z_to_bbox(kf_x[..., :4]),
        track_id=track_id,
        class_id=class_id,
        reported=(track_id >= 0) & (hits >= sc.min_hits),
        lost=died,
        lost_id=jnp.where(died, s.track_id, -1),
    )
    return s.replace(
        kf=Kf7State(x=kf_x, P=kf_P),
        track_id=track_id, class_id=class_id,
        hits=hits, age=age, frames=frames,
        next_id=s.next_id + jnp.sum(can).astype(jnp.int32),
    ), out
