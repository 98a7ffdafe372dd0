"""Benchmark protocol helper for the tunneled TPU platform.

Two measured pathologies make naive timing LIE here:
  1. Closure-captured device arrays are re-staged per call (~170 us/step
     scan pollution): pass all arrays as jit ARGUMENTS.
  2. Calls with bit-identical (executable, args) appear to be deduplicated
     by the platform (repeat calls return in ~20 us regardless of program
     cost): VARY at least one argument every call.

bench_scan_varied times a T-step lax.scan with reps distinct input sets,
pre-uploaded, blocking once at the end; reports us per scan step.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_scan_varied(scan_fn, make_args, reps=4, steps=1, warmup=1, tag=None):
    """scan_fn: jitted f(*args); make_args(i) -> args tuple (distinct per i).

    Returns us per step. Pre-uploads all argument sets, times reps calls
    pipelined, blocks on the last output.
    """
    argsets = [jax.tree.map(jnp.asarray, make_args(i)) for i in range(reps + warmup)]
    argsets = jax.block_until_ready(argsets)
    out = None
    for i in range(warmup):
        out = scan_fn(*argsets[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = scan_fn(*argsets[warmup + i])
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (reps * steps) * 1e6
    if tag:
        print(f"{tag:58s} {us:9.1f} us/step")
    return us
