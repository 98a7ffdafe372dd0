"""Many-sequence data-parallel replay over a device mesh.

The scale-out layer the reference lacks (SURVEY.md §2.5): its batch evaluation
is a *serial* loop over rosbags (batch_run_euroc.py:92-100). Here each device
runs an independent filter instance; states and frame streams are sharded over
the mesh's ``dp`` axis and the per-frame step is the same pure function used
single-chip — XLA inserts no collectives in the hot loop (embarrassingly
parallel), and metric reductions ride ``psum`` over ICI at the end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.core import FilterConfig
from ..filter.pipeline import FrameInput, filter_step
from ..filter.state import FilterState


def make_mesh(n_devices=None, axis="dp"):
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devs, (axis,))


def batched_step(cfg: FilterConfig):
    """vmap of the per-frame step over a leading batch (sequence) axis."""

    def step(states, frames, chi2):
        return jax.vmap(lambda s, f: filter_step(cfg, s, f, chi2))(states, frames)

    return step


def sharded_replay_fn(cfg: FilterConfig, mesh: Mesh, axis="dp"):
    """jit-compiled batched replay of T frames, sharded over sequences.

    Returns fn(states, frames, chi2) -> (states, outputs) where every leading
    ``B`` axis is sharded over the mesh; the scan over time stays on-device.

    Uses shard_map (explicit per-device SPMD) rather than GSPMD sharding
    annotations: the per-sequence filter instances are independent, and the
    partitioner must not get the chance to insert collectives — it does for
    ``lax.top_k``, whose TopK custom-call it cannot partition, turning the
    embarrassingly-parallel replay into an all-gather per frame (observed on
    the CPU backend; eval/scaling.py counts hot-loop collectives to keep
    this property pinned).
    """

    def replay(states, frames, chi2):
        def one(state, seq_frames):
            def step(st, fr):
                return filter_step(cfg, st, fr, chi2)

            return jax.lax.scan(step, state, seq_frames)

        return jax.vmap(one)(states, frames)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    # check_vma=False: filter_step's scans mix fresh constants into carries,
    # which the varying-manual-axes checker rejects; there are no collectives
    # for it to validate.
    return jax.jit(shard_map(
        replay, mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    ))


def shard_batch(tree, mesh: Mesh, axis="dp"):
    """Place a host-side batch pytree onto the mesh, leading axis sharded."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
