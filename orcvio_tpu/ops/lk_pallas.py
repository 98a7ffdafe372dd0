"""Fused Lucas-Kanade iteration loop as one Pallas TPU kernel.

Round-4 measurement (scripts/mfu_e2e.py, scan_bisect): the e2e replay runs
at MFU ~1e-4 — the wall is the NUMBER of sequential XLA ops per frame, not
FLOPs. The KLT level iterate is the largest op chain: 10 iterations x
(~10 HLO ops of one-hot resample each) x 4 levels + backward pass. This
kernel runs ALL iterations of one level for all features inside a single
op: windows live in VMEM, each iteration is two batched (MXU) one-hot
contractions + VPU lerps/solves, and the only HLO-level cost is one kernel
launch.

Numerics: the one-hot contractions REQUIRE precision=HIGHEST — Mosaic's
default f32 dot lowers to single-pass bf16 MXU, which rounds the selected
pixels to ~0.5 gray and (measured) degrades S1_slow 900-frame ATE from
0.039 to 0.785 m; with HIGHEST the kernel is exact f32 and ATE recovers
(0.058, within run noise of the XLA hi/lo-bf16 path). Contract mirrors
klt._lk_iterate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# aux layout per feature: [a11 a12 a22 det_safe lo_x lo_y hi_x hi_y
#                          origin_x origin_y p0_x p0_y det_ok . . .]
AUX_W = 16


def _resample_in_kernel(win, local_x, local_y, P, R, L):
    """Bilinear (P, P) patches inside the kernel. win (N, R, L);
    local_* (N, 1) — Mosaic requires >= 2-D vector layouts throughout.
    Returns (N, P, P)."""
    N = win.shape[0]
    f32 = win.dtype
    ly = jnp.clip(local_y, 0.0, R - 1.001 - P)
    lx = jnp.clip(local_x, 0.0, L - 1.001 - P)
    iy = jnp.floor(ly)
    ix = jnp.floor(lx)
    fy = (ly - iy)[:, :, None]  # (N, 1, 1)
    fx = (lx - ix)[:, :, None]
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, R), 2)
    rows_p = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, R), 1)
    wy = (rows_k == iy.astype(jnp.int32)[:, :, None] + rows_p).astype(f32)
    rows16 = jax.lax.dot_general(
        wy, win, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)  # (N, P+1, L)
    rows = rows16[:, :P] * (1 - fy) + rows16[:, 1:] * fy  # (N, P, L)
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, L), 2)
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, L), 1)
    wx = (cols_k == ix.astype(jnp.int32)[:, :, None] + cols_p).astype(f32)
    cols16 = jax.lax.dot_general(
        rows, wx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)  # (N, P, P+1)
    return cols16[:, :, :P] * (1 - fx) + cols16[:, :, 1:] * fx


def _lk_kernel(win_ref, t_ref, tgx_ref, tgy_ref, aux_ref, out_ref,
               *, iters: int, P: int, search_wd: int):
    win = win_ref[:]
    t = t_ref[:][:, :P, :P]
    tgx = tgx_ref[:][:, :P, :P]
    tgy = tgy_ref[:][:, :P, :P]
    aux = aux_ref[:]
    N, R, L = win.shape
    f32 = win.dtype
    col = lambda j: aux[:, j : j + 1]  # (N, 1)
    a11, a12, a22 = col(0), col(1), col(2)
    det_safe = col(3)
    lo_x, lo_y, hi_x, hi_y = col(4), col(5), col(6), col(7)
    r = (P - 1) // 2

    lx0 = jnp.clip(col(10), lo_x, hi_x)
    ly0 = jnp.clip(col(11), lo_y, hi_y)

    def body(_, carry):
        lx, ly, dn = carry
        cur = _resample_in_kernel(win, lx - r, ly - r, P, R, L)
        err = cur - t
        b1 = jnp.sum(tgx * err, axis=2).sum(axis=1, keepdims=True)  # (N, 1)
        b2 = jnp.sum(tgy * err, axis=2).sum(axis=1, keepdims=True)
        dx = (a22 * b1 - a12 * b2) / det_safe
        dy = (a11 * b2 - a12 * b1) / det_safe
        lx = jnp.clip(lx - dx, lo_x, hi_x)
        ly = jnp.clip(ly - dy, lo_y, hi_y)
        return lx, ly, jnp.sqrt(dx * dx + dy * dy)

    lx, ly, dn = jax.lax.fori_loop(
        0, iters, body, (lx0, ly0, jnp.full((N, 1), jnp.inf, f32)))
    cur = _resample_in_kernel(win, lx - r, ly - r, P, R, L)
    res = jnp.abs(cur - t).sum(axis=2).sum(axis=1, keepdims=True) / (P * P)
    z = jnp.zeros((N, 4), f32)
    out_ref[:] = jnp.concatenate([lx, ly, res, dn, z], axis=1)


@functools.partial(jax.jit, static_argnames=("iters", "patch", "search_wd",
                                             "block_n", "interpret"))
def lk_iterate_fused(win, t, tgx, tgy, aux, iters: int, patch: int,
                     search_wd: int, block_n: int = 64,
                     interpret: bool = False):
    """Run the full LK iteration loop for all features in one kernel.

    win (N, R, L) f32; t/tgx/tgy (N, P, P); aux (N, AUX_W) packed per-feature
    scalars (see layout above; positions are LOCAL window coords).
    Returns (N, 8): [local_x, local_y, residual, last_step_norm, 0...].
    """
    N, R, L = win.shape
    P = patch
    pad = (-N) % block_n
    if pad:
        z = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        win, t, tgx, tgy, aux = map(z, (win, t, tgx, tgy, aux))
        Np = N + pad
    else:
        Np = N
    grid = Np // block_n
    kernel = functools.partial(_lk_kernel, iters=iters, P=P,
                               search_wd=search_wd)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, 8), win.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_n, R, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, P, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, AUX_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(win, t, tgx, tgy, aux)
    return out[:N]
