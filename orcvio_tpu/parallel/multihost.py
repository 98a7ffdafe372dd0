"""Multi-host (DCN) scale-out: process-spanning meshes for the replay layer.

The reference's only "distributed" plane is ROS topics on one machine
(SURVEY.md §2.5). Here the many-sequence replay scales past one host the
JAX-native way: ``jax.distributed.initialize`` brings every process's devices
into one global mesh; per-host input shards are assembled into global arrays
(``jax.make_array_from_process_local_data``) so the jitted replay program is
identical to the single-host one — XLA routes any cross-host collectives over
DCN, while the per-sequence filter instances themselves never communicate
(embarrassingly parallel; metric reductions ride ``psum``).

Single-process use is zero-config: ``maybe_initialize()`` is a no-op unless
the coordinator environment variables are set, so the same entry point runs
on a laptop, one TPU host, or a pod slice.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ENV_COORD = "ORCVIO_COORDINATOR"  # host:port of process 0
_ENV_NPROC = "ORCVIO_NUM_PROCESSES"
_ENV_PID = "ORCVIO_PROCESS_ID"


def maybe_initialize() -> bool:
    """Join the jax.distributed cluster if the environment asks for one.

    Returns True when running multi-process. Controlled by
    ORCVIO_COORDINATOR / ORCVIO_NUM_PROCESSES / ORCVIO_PROCESS_ID so that TPU
    pod auto-detection (which needs none of them) keeps working when callers
    invoke ``jax.distributed.initialize()`` themselves.
    """
    coord = os.environ.get(_ENV_COORD)
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ[_ENV_NPROC]),
        process_id=int(os.environ[_ENV_PID]),
    )
    return True


def global_mesh(axis: str = "dp") -> Mesh:
    """One mesh axis over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_to_global(tree, mesh: Mesh, axis: str = "dp"):
    """Assemble per-process local batch shards into global sharded arrays.

    Each process passes its own slice of the batch (leading axis =
    local_batch); the result behaves as one (num_processes * local_batch)
    global array sharded over the mesh.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )


def replicate_to_global(tree, mesh: Mesh):
    """Place identical (replicated) values on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
