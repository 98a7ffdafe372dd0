"""Filter-state checkpoint/resume via orbax.

The reference has no checkpointing (SURVEY.md §5 — its only persisted
artifacts are text logs); here the whole VioState/FilterState is a pytree, so
long replays can snapshot and resume exactly. Used by the batch evaluator for
fault tolerance on long sequences.
"""
from __future__ import annotations

import os

import jax


def save_state(path: str, state, step: int = 0):
    """Save any pytree state (FilterState / VioState / tracker) to `path/step`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, str(step)), state, force=True)
    ckpt.wait_until_finished()
    return os.path.join(path, str(step))


def restore_state(path: str, template, step: int = 0):
    """Restore a pytree saved by save_state; `template` supplies the structure."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.join(path, str(step)), template)


def latest_step(path: str):
    if not os.path.isdir(path):
        return None
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None
