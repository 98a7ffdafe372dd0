"""KLT internals throughput on TPU: windows vs iteration matmuls vs grads.

Run: python scripts/bisect_klt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend.image import gradients
from orcvio_tpu.frontend.klt import _local_sample, track_level
from orcvio_tpu.ops.window_extract import padded_windows

H, W, N = 480, 752, 200
PATCH = 15
R = (PATCH - 1) // 2
SEARCH = 9
WD = PATCH + 2 * SEARCH + 2  # 35
TAPS = np.arange(-R, R + 1)


def bench(tag, fn, *args, reps=50):
    fnj = jax.jit(fn)
    out = fnj(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fnj(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag:46s} {ms:8.3f} ms")
    return ms


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    xy = jnp.asarray(
        np.stack([rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], 1),
        jnp.float32)

    bench("gradients (full res)", gradients, img)
    bench("padded_windows 1ch wd=35", lambda im, c: padded_windows(im[None], c, -(WD // 2), WD), img, xy)
    big = jnp.stack([img, img, img])
    bench("padded_windows 3ch wd=16", lambda im, c: padded_windows(im, c, -R, PATCH + 1), big, xy)

    windows = jnp.asarray(rng.uniform(0, 255, (N, WD, WD)), jnp.float32)
    local = jnp.asarray(rng.uniform(R + 1, WD - R - 2, (N, 2)), jnp.float32)

    bench("_local_sample x1", lambda w, l: _local_sample(w, l, TAPS), windows, local)

    def iters10(w, l):
        acc = jnp.zeros((N, PATCH, PATCH), w.dtype)
        for i in range(10):
            cur = _local_sample(w, l + 0.01 * i, TAPS)
            acc = acc + cur
        return acc

    bench("_local_sample x10 (iteration loop)", iters10, windows, local)

    def iters10_sum(w, l):
        # iteration loop incl. the b1/b2 reductions + solve, like track_level
        gx = jnp.ones((N, PATCH, PATCH), w.dtype)
        gy = jnp.ones((N, PATCH, PATCH), w.dtype)
        t = jnp.zeros((N, PATCH, PATCH), w.dtype)
        p = l
        for i in range(10):
            cur = _local_sample(w, p, TAPS)
            err = cur - t
            b1 = jnp.sum(gx * err, axis=(1, 2))
            b2 = jnp.sum(gy * err, axis=(1, 2))
            p = p + 0.001 * jnp.stack([b1, b2], 1)
        return p

    bench("full iteration loop x10", iters10_sum, windows, local)

    bench("track_level (one level)",
          lambda a, b, p, q: track_level(a, b, p, q, PATCH, 10, 0.01),
          img, img, xy, xy)

    # bf16 variants
    wb = windows.astype(jnp.bfloat16)
    lb = local.astype(jnp.bfloat16)
    bench("_local_sample x10 bf16", iters10, wb, lb)


if __name__ == "__main__":
    main()
