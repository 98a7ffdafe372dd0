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
    """
    batch_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def replay(states, frames, chi2):
        def one(state, seq_frames):
            def step(st, fr):
                return filter_step(cfg, st, fr, chi2)

            return jax.lax.scan(step, state, seq_frames)

        return jax.vmap(one)(states, frames)

    return jax.jit(
        replay,
        in_shardings=(batch_sharding, batch_sharding, repl),
        out_shardings=(batch_sharding, batch_sharding),
    )


def shard_batch(tree, mesh: Mesh, axis="dp"):
    """Place a host-side batch pytree onto the mesh, leading axis sharded."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
