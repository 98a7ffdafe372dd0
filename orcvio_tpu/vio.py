"""Top-level VIO step: static initialization -> filter, as one pure function.

Equivalent of the reference's processFeatures entry (orcvio.cpp:500-560):
until initialization succeeds, frames feed the static initializer
(FlexibleInitializer's first stage; the dynamic fallback lives in
orcvio_tpu/init/dynamic*); afterwards every frame runs the MSCKF step. Both
branches are compiled once and selected with ``lax.cond``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .config.core import FilterConfig
from .filter import propagation as prop
from .filter.pipeline import FrameInput, FrameOutput, build_chi2_table, filter_step
from .filter.state import FilterState
from .init.static_init import StaticInitState, initial_imu_state, static_init_step


class VioState(struct.PyTreeNode):
    filter: FilterState
    sinit: StaticInitState

    @classmethod
    def create(cls, cfg: FilterConfig, max_obs: int, dtype=jnp.float32):
        return cls(
            filter=FilterState.create(cfg, dtype),
            sinit=StaticInitState.create(max_obs, dtype),
        )


def vio_step(cfg: FilterConfig, state: VioState, frame: FrameInput, chi2_table):
    """One frame end-to-end (init or filter)."""

    def do_init(st: VioState):
        sinit = static_init_step(
            cfg, st.sinit, frame.fids, frame.uvs, frame.meas_mask,
            frame.imu_gyro, frame.imu_acc, frame.imu_mask,
        )
        just_done = sinit.done & ~st.sinit.done

        imu0 = initial_imu_state(cfg, sinit, st.filter.P.dtype)
        # last valid imu sample time = state time at takeoff
        t0 = jnp.max(jnp.where(frame.imu_mask, frame.imu_t, -jnp.inf))
        t0 = jnp.where(jnp.isfinite(t0), t0, frame.t).astype(st.filter.t.dtype)
        last_idx = jnp.argmax(jnp.where(frame.imu_mask, frame.imu_t, -jnp.inf))
        fs = st.filter
        fs_new = fs.replace(
            imu=imu0, imu_old=imu0, imu_fej_now=imu0, imu_fej_old=imu0,
            t=t0, initialized=jnp.ones((), bool),
            last_gyro=frame.imu_gyro[last_idx], last_acc=frame.imu_acc[last_idx],
        )
        fs = jax.tree.map(lambda a, b: jnp.where(just_done, a, b), fs_new, fs)
        out = FrameOutput(
            t=frame.t, R=fs.imu.R, p=fs.imu.p, v=fs.imu.v,
            n_update_features=jnp.zeros((), jnp.int32),
            dx_norm=jnp.zeros((), st.filter.P.dtype),
            zupt=jnp.zeros((), bool),
        )
        return st.replace(filter=fs, sinit=sinit), out

    def do_filter(st: VioState):
        fs, out = filter_step(cfg, st.filter, frame, chi2_table)
        return st.replace(filter=fs), out

    return jax.lax.cond(state.filter.initialized, do_filter, do_init, state)


def run_vio(cfg: FilterConfig, state: VioState, frames: FrameInput, chi2_table):
    def step(st, fr):
        return vio_step(cfg, st, fr, chi2_table)

    return jax.lax.scan(step, state, frames)
