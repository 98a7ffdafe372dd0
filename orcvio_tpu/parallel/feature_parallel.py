"""Feature-parallel measurement update: shard Jacobian construction over
devices and psum the information contributions.

The scale-out layer the reference lacks (SURVEY.md §5): the stacked MSCKF
update depends on the measurements only through the information pair
Lambda = H^T H and b = H^T r (with isotropic noise) — an associative
reduction, exactly like blockwise-softmax accumulation in ring attention.
Each device triangulates + differentiates its shard of the feature table,
accumulates its local (Lambda, b), and one `psum` over the `fp` mesh axis
recovers the full-information update; the state stays replicated. The update
itself is the Cholesky-compressed equivalent of the stacked-QR path
(R^T R = H^T H), verified equal in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.core import FilterConfig
from ..filter.state import FilterState
from ..filter.tracks import CompactTracks
from ..filter.triangulation import triangulate
from ..filter.update import (
    FeatureJacobians,
    feature_jacobians,
    gate_features,
    information_update,
)


def information_from_jacobians(fj: FeatureJacobians, use_mask):
    """(Lambda, b) accumulated over this shard's features."""
    H = jnp.where(use_mask[:, None, None], fj.H, 0.0)
    r = jnp.where(use_mask[:, None], fj.r, 0.0)
    Hm = H.reshape(-1, H.shape[-1])
    rm = r.reshape(-1)
    return Hm.T @ Hm, Hm.T @ rm


def pad_feature_axis(ct: CompactTracks, p_w, use, n_dev: int):
    """Pad the feature axis to a multiple of n_dev so any real config
    (e.g. max_features=200 on 8 devices) shards evenly.

    Padded rows carry use=False, so they contribute exact zeros to the
    information pair — the update is bit-identical to the unpadded one.
    """
    F = use.shape[0]
    pad = (-F) % n_dev
    if pad == 0:
        return ct, p_w, use
    ctp = jax.tree.map(lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), ct)
    p_wp = jnp.pad(p_w, ((0, pad), (0, 0)))
    usep = jnp.pad(use, (0, pad))  # False padding
    return ctp, p_wp, usep


def feature_parallel_update(cfg: FilterConfig, mesh: Mesh, axis: str = "fp"):
    """Build a jitted sharded update: features split over `axis`, state replicated.

    Returns fn(state, ct_shardable, p_w, use_mask_inputs...) — here we take the
    already-classified inputs: ct (CompactTracks, feature axis shardable),
    p_w (F, 3), use (F,). The feature axis is zero-padded to a multiple of the
    mesh axis size, so capacity need not divide the device count. All devices
    produce the identical updated state.
    """
    n_dev = mesh.shape[axis]

    def local(state, ct, p_w, use):
        # HIGHEST precision: the one-hot einsum Jacobian assembly and the
        # Householder nullspace matvecs otherwise round through the TPU
        # default bf16 single-pass dot — the covariance-corrupting failure
        # mode documented in filter/pipeline.py (commit 505c719). The main
        # filter path sets this in pipeline.py; this sharded path must too.
        with jax.default_matmul_precision("highest"):
            fj = feature_jacobians(cfg, state, ct, p_w)
            Lam, b = information_from_jacobians(fj, use)
            Lam = jax.lax.psum(Lam, axis)
            b = jax.lax.psum(b, axis)
            new_state, dx = information_update(cfg, state, Lam, b)
        return new_state, dx

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )

    def padded(state, ct, p_w, use):
        ct, p_w, use = pad_feature_axis(ct, p_w, use, n_dev)
        return fn(state, ct, p_w, use)

    return jax.jit(padded)
