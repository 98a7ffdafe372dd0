"""Feature-table bookkeeping: matching, allocation, lifecycle.

TPU-native equivalent of ``addFeatureObservations`` (orcvio.cpp:1016) and the
``map_server`` std::map bookkeeping: id matching and row allocation are dense
batched ops over the fixed-capacity table (M x F boolean match + prefix-sum
slot assignment), fully jit-compatible.
"""
from __future__ import annotations

import jax.numpy as jnp

from .state import FeatureTable


def add_observations(table: FeatureTable, slot, fids, uvs, uv_vels, meas_valid):
    """Scatter this frame's measurements into the table at clone `slot`.

    fids: (M,) int32 track ids (-1/masked rows ignored); uvs: (M, 2) normalized
    coords; meas_valid: (M,) bool. Existing rows (matching fid) get the new
    observation appended; unmatched measurements are allocated free rows (in
    table order). Rows that receive no measurement this frame become inactive
    (= lost, ready for the update). Returns (table, tracked_count).
    """
    F = table.fid.shape[0]
    M = fids.shape[0]
    meas_valid = meas_valid & (fids >= 0)

    # --- match measurements to existing live rows ---
    live = table.fid >= 0
    eq = (fids[:, None] == table.fid[None, :]) & meas_valid[:, None] & live[None, :]  # (M, F)
    matched_meas = jnp.any(eq, axis=1)  # (M,)
    row_of_meas = jnp.argmax(eq, axis=1)  # (M,) valid where matched_meas

    # --- allocate free rows for new measurements ---
    is_new = meas_valid & ~matched_meas
    free = ~live  # free rows
    # rank of each free row among free rows / each new meas among new meas
    free_rank = jnp.cumsum(free) - 1  # (F,)
    new_rank = jnp.cumsum(is_new) - 1  # (M,)
    n_free = jnp.sum(free)
    can_alloc = is_new & (new_rank < n_free)
    # row index for the k-th new measurement = index of k-th free row
    # build map rank -> row: scatter row indices by rank
    rank_to_row = jnp.zeros((F,), jnp.int32).at[jnp.where(free, free_rank, F)].set(
        jnp.arange(F, dtype=jnp.int32), mode="drop"
    )
    alloc_row = rank_to_row[jnp.clip(new_rank, 0, F - 1)]

    target_row = jnp.where(matched_meas, row_of_meas, alloc_row)
    write = matched_meas | can_alloc
    # scatter: uv[target_row, slot] = uvs
    rows = jnp.where(write, target_row, F)  # F = out-of-bounds drop
    uv = table.uv.at[rows, slot].set(uvs, mode="drop")
    uv_vel = table.uv_vel.at[rows, slot].set(uv_vels, mode="drop")
    uv_valid = table.uv_valid.at[rows, slot].set(True, mode="drop")
    fid = table.fid.at[jnp.where(can_alloc, target_row, F)].set(fids, mode="drop")

    # --- lifecycle: active = received a measurement this frame ---
    got_meas = jnp.zeros((F,), bool).at[rows].set(True, mode="drop")
    active = got_meas & (fid >= 0)
    tracked_count = jnp.sum(matched_meas)
    return table.replace(uv=uv, uv_vel=uv_vel, uv_valid=uv_valid, fid=fid, active=active), tracked_count


def track_lengths(table: FeatureTable):
    return jnp.sum(table.uv_valid, axis=1)


def free_rows(table: FeatureTable, kill_mask):
    """Erase features (map_server.erase equivalent): clear obs + id + state."""
    keep = ~kill_mask
    return table.replace(
        uv_valid=table.uv_valid & keep[:, None],
        fid=jnp.where(kill_mask, -1, table.fid),
        active=table.active & keep,
        in_state=table.in_state & keep,
        state_slot=jnp.where(kill_mask, -1, table.state_slot),
        anchor_slot=jnp.where(kill_mask, -1, table.anchor_slot),
    )
