"""Race window-extraction formulations under the scan protocol.

Extract N=200 windows of (36, 36-or-128) from a 480x752 image, T frames in
one lax.scan (data varies per frame), B=1 and vmapped B=8.

Run: python scripts/race_extract.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, N, WD, T = 480, 752, 200, 36, 30
PAD = 40  # edge pad so windows never clip
HP = H + 2 * PAD            # 560
WP = ((W + 2 * PAD + 127) // 128) * 128  # 896


def prep(img):
    """Edge-pad to (HP, WP)."""
    p = jnp.pad(img, ((PAD, PAD), (PAD, PAD)), mode="edge")
    return jnp.pad(p, ((0, 0), (0, WP - p.shape[1])))


# ---- 1. current: vmap dynamic_slice -----------------------------------------
def extract_dynslice(imgp, oy, ox):
    def one(y0, x0):
        return jax.lax.dynamic_slice(imgp, (y0, x0), (WD, WD))
    return jax.vmap(one)(oy, ox)


# ---- 2. row gather + col one-hot einsum --------------------------------------
def extract_rowgather(imgp, oy, ox):
    rows = oy[:, None] + jnp.arange(WD)[None, :]          # (N, WD)
    strips = imgp[rows.reshape(-1)].reshape(N, WD, WP)     # leading-dim gather
    k = jnp.arange(WP, dtype=jnp.int32)
    sel = (k[None, :, None] == (ox[:, None, None] + jnp.arange(WD)[None, None, :]))
    sel = sel.astype(imgp.dtype)                           # (N, WP, WD)
    return jnp.einsum("nrw,nwk->nrk", strips, sel,
                      precision=jax.lax.Precision.DEFAULT)


# ---- 3. full one-hot matmul (rows + cols) ------------------------------------
def extract_onehot(imgp, oy, ox):
    h = jnp.arange(HP, dtype=jnp.int32)
    R = (h[None, None, :] == (oy[:, None, None] + jnp.arange(WD)[None, :, None]))
    R = R.astype(imgp.dtype).reshape(N * WD, HP)
    strips = (R @ imgp).reshape(N, WD, WP)
    k = jnp.arange(WP, dtype=jnp.int32)
    sel = (k[None, :, None] == (ox[:, None, None] + jnp.arange(WD)[None, None, :]))
    sel = sel.astype(imgp.dtype)
    return jnp.einsum("nrw,nwk->nrk", strips, sel,
                      precision=jax.lax.Precision.DEFAULT)


# ---- 4. pallas: dynamic sublane start, 64-aligned lane start, 128 lanes out --
FCHUNK = 8


def _gather_kernel(oy_ref, ox64_ref, img_ref, out_ref):
    base = pl.program_id(0) * FCHUNK
    for i in range(FCHUNK):
        oy = oy_ref[base + i]
        ox = ox64_ref[base + i]
        out_ref[i] = img_ref[pl.ds(oy, WD), pl.ds(ox, 128)]


def extract_pallas(imgp, oy, ox):
    ox64 = (ox // 64) * 64
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // FCHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((FCHUNK, WD, 128),
                               lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, WD, 128), imgp.dtype),
        grid_spec=grid_spec,
    )(oy, ox64, imgp)
    return out, ox - ox64  # window at lane offset (ox - ox64) in [0, 63]


VARIANTS = {
    "dynslice": lambda imgp, oy, ox: extract_dynslice(imgp, oy, ox),
    "rowgather+colonehot": extract_rowgather,
    "full-onehot": extract_onehot,
    "pallas64": extract_pallas,
}


def bench(name, fn, batch=None, reps=5):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (T, H, W)), jnp.float32)
    oys = jnp.asarray(rng.integers(0, H, (T, N)), jnp.int32) + PAD - WD // 2
    oxs = jnp.asarray(rng.integers(0, W, (T, N)), jnp.int32) + PAD - WD // 2

    def step(c, xs):
        img, oy, ox = xs
        w = fn(prep(img), oy, ox)
        w0 = w[0] if isinstance(w, tuple) else w
        # consume EVERY element nonlinearly so XLA cannot narrow the
        # gather (w0[:,0,0] let it DCE the extraction to one pixel)
        return c + jnp.sum(w0 * w0), None

    def scan(c0, imgs, oys, oxs):
        return jax.lax.scan(step, c0, (imgs, oys, oxs))[0]

    if batch:
        f = jax.jit(jax.vmap(scan))
        args = (jnp.zeros((batch,)), jnp.stack([imgs] * batch),
                jnp.stack([oys] * batch), jnp.stack([oxs] * batch))
    else:
        f = jax.jit(scan)
        args = (jnp.zeros(()), imgs, oys, oxs)
    try:
        out = jax.block_until_ready(f(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} B={batch or 1}  FAILED: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (reps * T * (batch or 1)) * 1e6
    print(f"{name:28s} B={batch or 1}  {us:8.1f} us/extract-equiv")


def main():
    for name, fn in VARIANTS.items():
        for B in (None, 8):
            bench(name, fn, batch=B)


if __name__ == "__main__":
    main()
