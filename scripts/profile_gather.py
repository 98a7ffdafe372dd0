"""Head-to-head: block one-hot gather_windows vs while-loop padded_windows.

Profiles a 30-frame scan doing 8x 200-window extractions per frame.
Run: python scripts/profile_gather.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_scan import parse_xplane
from orcvio_tpu.ops.window_extract import padded_windows
from orcvio_tpu.ops.window_gather import gather_windows, prepare_image

H, W, N, T = 480, 752, 200, 30
RNG = np.random.default_rng(0)
BASE = RNG.uniform(0, 255, (T, H, W)).astype(np.float32)


def run(tag, per_frame, logdir):
    xy0 = jnp.asarray(RNG.uniform(40, 400, (N, 2)), jnp.float32)

    def step(xy, img):
        acc = per_frame(img, xy)
        return jnp.clip(xy + 0.01 * acc, 40.0, 400.0), acc[0, 0]

    f = jax.jit(lambda xy, ims: jax.lax.scan(step, xy, ims))
    a = jnp.asarray(BASE)
    jax.block_until_ready(f(xy0, a))
    with jax.profiler.trace(logdir):
        jax.block_until_ready(f(xy0, a + 0.01))
    print(f"######## {tag} ########")
    parse_xplane(logdir)


def pf_old(img, xy):
    acc = jnp.zeros((N, 2), img.dtype)
    for i in range(8):
        wins, org = padded_windows(img[None], xy + i, -17, 36)
        acc = acc + 1e-7 * jnp.sum(wins[0] ** 2, axis=(1, 2))[:, None]
    return acc


def pf_new(img, xy):
    ai = prepare_image(img[None], margin=40, precision="f32x2")
    acc = jnp.zeros((N, 2), img.dtype)
    for i in range(8):
        wins, org = gather_windows(ai, xy + i, -17, 36, rows=48, lanes=256)
        acc = acc + 1e-7 * jnp.sum(wins[0] ** 2, axis=(1, 2))[:, None]
    return acc


def verify():
    img = jnp.asarray(BASE[0])
    xy = jnp.asarray(RNG.uniform(5, 470, (N, 2)), jnp.float32)
    ai = prepare_image(img[None], margin=40, precision="f32x2")
    wins, org = jax.jit(lambda a, x: gather_windows(a, x, -17, 36, 48, 256))(ai, xy)
    wold, oold = jax.jit(lambda i, x: padded_windows(i[None], x, -17, 36))(img, xy)
    # compare logical windows: old window starts at oold; in new layout it is
    # at offset oold - org
    off = (np.asarray(oold) - np.asarray(org)).astype(int)
    wn, wo = np.asarray(wins[0]), np.asarray(wold[0])
    errs = []
    for n in range(N):
        dx, dy = off[n]
        errs.append(np.abs(wn[n, dy:dy + 36, dx:dx + 36] - wo[n]).max())
    print("max err new-vs-old:", float(np.max(errs)),
          "offsets y:", off[:, 1].min(), off[:, 1].max(),
          "x:", off[:, 0].min(), off[:, 0].max())


if __name__ == "__main__":
    verify()
    run("old padded_windows x8", pf_old, "/tmp/prof_gold")
    run("new gather_windows x8", pf_new, "/tmp/prof_gnew")
