"""Nail the 23us-vs-1000us track_level contradiction.
Run: python scripts/bisect_ab.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend.klt import track_level

H, W, N = 480, 752, 200
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
xy0 = jnp.asarray(rng.uniform(30, 400, (N, 2)), jnp.float32)
xy1 = xy0 + jnp.asarray(rng.uniform(-3, 3, (N, 2)), jnp.float32)


def run(tag, fn_j, args, reps=50, per_call_block=False):
    out = jax.block_until_ready(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
        if per_call_block:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / reps * 1e6
    print(f"{tag:58s} {us:9.1f} us")


def main():
    f = lambda i0, i1, p0, p1: track_level(i0, i1, p0, p1, 15, 10, 0.01)

    run("traced args, pipelined", jax.jit(f), (img0, img1, xy0, xy1))
    run("traced args, block per call", jax.jit(f), (img0, img1, xy0, xy1),
        per_call_block=True)
    run("closure consts, pipelined", jax.jit(lambda: f(img0, img1, xy0, xy1)), ())
    # different xy1 guess (xy0==xy1 might converge instantly -> clamp path?)
    run("traced, p1 == p0 exactly", jax.jit(f), (img0, img1, xy0, xy0))
    # dummy-arg closure (consts but with one traced arg)
    run("consts + dummy traced arg",
        jax.jit(lambda z: f(img0 + z, img1, xy0, xy1)), (jnp.float32(0.0),))


if __name__ == "__main__":
    main()
