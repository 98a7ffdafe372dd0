"""Decompose track_level cost op-by-op, at B=1 and under vmap (B=8).

Finds (a) the per-level-pass fixed-cost hog and (b) which op stops scaling
under a sequence batch axis. Run: python scripts/bisect_level.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend.image import gradients
from orcvio_tpu.frontend.klt import _axis_weights, _local_sample, track_level
from orcvio_tpu.ops.window_extract import padded_windows

H, W, N = 480, 752, 200
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
xy = jnp.asarray(rng.uniform(30, 400, (N, 2)), jnp.float32)
taps = np.arange(-7, 8)


def bench(tag, fn, *args, reps=50, batch=None):
    if batch:
        args = tuple(
            jnp.stack([a + 0.0 * i for i in range(batch)])
            if isinstance(a, jnp.ndarray) else a
            for a in args
        )
        fn_b = jax.jit(jax.vmap(fn))
    else:
        fn_b = jax.jit(fn)
    out = jax.block_until_ready(fn_b(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_b(*args)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / reps * 1e6
    scale = f" ({us / batch:7.1f} us/elem)" if batch else ""
    print(f"{tag:44s} {us:9.1f} us{scale}")
    return us


def win_search(im, centers):
    w, o = padded_windows(im[None], jnp.round(centers), -17, 35)
    return w[0], o


def win_template(im, centers):
    Ix, Iy = gradients(im)
    big = jnp.stack([im, Ix, Iy])
    wins, o = padded_windows(big, centers, -7, 16)
    local = centers - o
    ext = jax.vmap(lambda w: _local_sample(w, local, taps))(wins)
    return ext


def one_iter(windows, local):
    return _local_sample(windows, local, taps)


def one_iter_weights(local):
    wy = _axis_weights(local[:, 1], 35, taps)
    wx = _axis_weights(local[:, 0], 35, taps)
    return wy, wx


def grad_only(im):
    return gradients(im)


def full_level(i0, i1, p0, p1):
    return track_level(i0, i1, p0, p1, 15, 10, 0.01)


def pad_only(im):
    return jnp.pad(im[None], ((0, 0), (34, 34), (34, 34)), mode="edge")


def main():
    win, origin = jax.jit(win_search)(img1, xy)
    win = jax.block_until_ready(win)
    local = xy - origin

    for B in (None, 8):
        tag = "B=1" if B is None else f"vmap B={B}"
        print(f"--- {tag} ---")
        bench("pad(edge 34) full image", pad_only, img1, batch=B)
        bench("gradients full image", grad_only, img0, batch=B)
        bench("search windows (pad+extract 35x35)", win_search, img1, xy, batch=B)
        bench("template (grad+pad+extract+resample)", win_template, img0, xy, batch=B)
        bench("one resample (2 einsums highest)", one_iter, win, local, batch=B)
        bench("axis weights only", one_iter_weights, local, batch=B)
        bench("track_level full (10 iters)", full_level, img0, img1, xy, xy, batch=B)


if __name__ == "__main__":
    main()
