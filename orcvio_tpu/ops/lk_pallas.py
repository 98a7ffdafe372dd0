"""Fused Lucas-Kanade kernels: one Pallas op per pyramid level.

`lk_level_fused` (round 5, the production path) runs template extraction +
ALL LK iterations of one level in a single kernel: a (P+2) patch resample
of the img0 window with in-patch central differences (equal to resampling
precomputed gradient arrays, by linearity of bilinear interpolation), the
Hessian, then the iteration loop over the img1 window with the reference's
cv::TermCriteria-style eps early termination. `lk_iterate_fused` is the
round-4 iterate-only kernel, kept as the _lk_iterate_pallas fallback and
for its parity tests.

Numerics: a bare f32 Mosaic dot lowers to a SINGLE bf16 MXU pass, which
rounds one-hot-selected pixels to ~0.5 gray (measured: S1_slow 900-frame
ATE 0.039 -> 0.785 m, commit 505c719); an f32 HIGHEST dot is exact but
costs 6 passes. All selections therefore contract 0/1 bf16 one-hots
against an explicit hi/lo bf16 split of the pixels (`_dot2`): two
single-pass dots, exact to ~2^-8 gray, applied to RAW pixels with the
fractional 2-D lerp last in f32. Pinned by tests/test_lk_pallas.py.
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


def _split_hi_lo(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo == x to ~2^-8 * ulp(x)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _dot2(a_bf16, x_hi, x_lo, dims, f32):
    """Exact contraction of a 0/1 one-hot (bf16) against hi/lo-split pixels:
    two single-pass bf16 MXU dots instead of one f32 HIGHEST dot (6 passes).
    bf16 one-hot entries are exact; each product selects one hi/lo value;
    the f32 accumulate restores the original pixel to ~2^-8 * ulp. NB no
    `precision=` here: both operands are ALREADY bf16 (nothing to split —
    Mosaic rejects HIGHEST on bf16 lhs); exactness comes from the split,
    pinned by tests/test_lk_pallas.py::test_kernel_dots_are_exact."""
    out = jax.lax.dot_general(a_bf16, x_hi, dims, preferred_element_type=f32)
    return out + jax.lax.dot_general(a_bf16, x_lo, dims,
                                     preferred_element_type=f32)


def _resample_in_kernel(win_hi, win_lo, local_x, local_y, P, R, L, f32):
    """Bilinear (P, P) patches inside the kernel. win_hi/lo (N, R, L) bf16
    hi/lo split (split once per kernel call); local_* (N, 1) — Mosaic
    requires >= 2-D vector layouts throughout. Returns (N, P, P).

    Both integer selections run on RAW (split) pixels — selections commute —
    and the 2-D fractional lerp runs last in f32, so the result matches the
    all-f32 formulation to the ~0.002-gray split error while every MXU pass
    is single-pass bf16."""
    N = win_hi.shape[0]
    ly = jnp.clip(local_y, 0.0, R - 1.001 - P)
    lx = jnp.clip(local_x, 0.0, L - 1.001 - P)
    iy = jnp.floor(ly)
    ix = jnp.floor(lx)
    fy = (ly - iy)[:, :, None]  # (N, 1, 1)
    fx = (lx - ix)[:, :, None]
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, R), 2)
    rows_p = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, R), 1)
    wy = (rows_k == iy.astype(jnp.int32)[:, :, None] + rows_p
          ).astype(jnp.bfloat16)
    rows16 = _dot2(wy, win_hi, win_lo, (((2,), (1,)), ((0,), (0,))), f32)
    rh, rl = _split_hi_lo(rows16)  # (N, P+1, L) raw selected pixels
    cols_k = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, L), 2)
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (N, P + 1, L), 1)
    wx = (cols_k == ix.astype(jnp.int32)[:, :, None] + cols_p
          ).astype(jnp.bfloat16)
    # patch[n, p, q] = rows16[n, p, ix+q]  (contraction over L)
    patch = _dot2(wx, rh, rl, (((2,), (2,)), ((0,), (0,))), f32)
    patch = jnp.swapaxes(patch, 1, 2)  # (N, P+1, P+1)
    p00 = patch[:, :P, :P]
    p01 = patch[:, :P, 1:]
    p10 = patch[:, 1:, :P]
    p11 = patch[:, 1:, 1:]
    return ((1 - fy) * ((1 - fx) * p00 + fx * p01)
            + fy * ((1 - fx) * p10 + fx * p11))


def _lk_kernel(win_ref, t_ref, tgx_ref, tgy_ref, aux_ref, out_ref,
               *, iters: int, P: int, search_wd: int):
    win = win_ref[:]
    t = t_ref[:][:, :P, :P]
    tgx = tgx_ref[:][:, :P, :P]
    tgy = tgy_ref[:][:, :P, :P]
    aux = aux_ref[:]
    N, R, L = win.shape
    f32 = win.dtype
    win_hi, win_lo = _split_hi_lo(win)  # once per kernel, reused per iter
    col = lambda j: aux[:, j : j + 1]  # (N, 1)
    a11, a12, a22 = col(0), col(1), col(2)
    det_safe = col(3)
    lo_x, lo_y, hi_x, hi_y = col(4), col(5), col(6), col(7)
    r = (P - 1) // 2

    lx0 = jnp.clip(col(10), lo_x, hi_x)
    ly0 = jnp.clip(col(11), lo_y, hi_y)

    def body(_, carry):
        lx, ly, dn = carry
        cur = _resample_in_kernel(win_hi, win_lo, lx - r, ly - r, P, R, L, f32)
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
    cur = _resample_in_kernel(win_hi, win_lo, lx - r, ly - r, P, R, L, f32)
    res = jnp.abs(cur - t).sum(axis=2).sum(axis=1, keepdims=True) / (P * P)
    z = jnp.zeros((N, 4), f32)
    out_ref[:] = jnp.concatenate([lx, ly, res, dn, z], axis=1)


def _lk_level_kernel(win0_ref, win1_ref, aux_ref, out_ref,
                     *, iters: int, P: int, search_wd: int,
                     eps: float = 0.01):
    """Template extraction + the full LK iteration loop in ONE kernel.

    Template: one (P+2)-sized resample of win0 at the feature position, with
    central differences taken INSIDE the patch — identical to resampling
    precomputed gradient arrays (bilinear interpolation and central
    differencing commute by linearity), so the separate XLA gx/gy/stack/
    3-channel-resample chain per level disappears.
    """
    win0 = win0_ref[:]
    win1 = win1_ref[:]
    aux = aux_ref[:]
    N, R, L = win1.shape
    f32 = win1.dtype
    col = lambda j: aux[:, j : j + 1]  # (N, 1)
    p0x, p0y = col(0), col(1)
    lo_x, lo_y, hi_x, hi_y = col(4), col(5), col(6), col(7)
    r = (P - 1) // 2

    # --- template from win0 ---
    w0h, w0l = _split_hi_lo(win0)
    Pt = P + 2
    tp = _resample_in_kernel(w0h, w0l, p0x - (r + 1), p0y - (r + 1),
                             Pt, R, L, f32)
    t = tp[:, 1:-1, 1:-1]
    tgx = 0.5 * (tp[:, 1:-1, 2:] - tp[:, 1:-1, :-2])
    tgy = 0.5 * (tp[:, 2:, 1:-1] - tp[:, :-2, 1:-1])
    a11 = jnp.sum(tgx * tgx, axis=2).sum(axis=1, keepdims=True)
    a12 = jnp.sum(tgx * tgy, axis=2).sum(axis=1, keepdims=True)
    a22 = jnp.sum(tgy * tgy, axis=2).sum(axis=1, keepdims=True)
    det = a11 * a22 - a12 * a12
    det_safe = jnp.where(det > 1e-6, det, 1.0)

    # --- iterate over win1 ---
    # Early termination mirrors the reference's cv::TermCriteria (COUNT +
    # EPS, eps = 0.01, image_processor's calcOpticalFlowPyrLK): the loop
    # stops when EVERY feature's step norm fell below eps (a whole-block
    # reduce — per-feature exit is impossible in lockstep, but a converged
    # feature's subsequent steps are < eps by definition, so the block-level
    # stop changes positions by < eps * remaining_iters only). eps = 0
    # reproduces the fixed-count loop exactly (used by the parity tests).
    w1h, w1l = _split_hi_lo(win1)
    lx0 = jnp.clip(col(10), lo_x, hi_x)
    ly0 = jnp.clip(col(11), lo_y, hi_y)

    def cond(carry):
        i, lx, ly, dn = carry
        return (i < iters) & (jnp.max(dn) > eps)

    def body(carry):
        i, lx, ly, dn = carry
        cur = _resample_in_kernel(w1h, w1l, lx - r, ly - r, P, R, L, f32)
        err = cur - t
        b1 = jnp.sum(tgx * err, axis=2).sum(axis=1, keepdims=True)
        b2 = jnp.sum(tgy * err, axis=2).sum(axis=1, keepdims=True)
        dx = (a22 * b1 - a12 * b2) / det_safe
        dy = (a11 * b2 - a12 * b1) / det_safe
        lx = jnp.clip(lx - dx, lo_x, hi_x)
        ly = jnp.clip(ly - dy, lo_y, hi_y)
        return i + 1, lx, ly, jnp.sqrt(dx * dx + dy * dy)

    _, lx, ly, dn = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), lx0, ly0, jnp.full((N, 1), jnp.inf, f32)))
    cur = _resample_in_kernel(w1h, w1l, lx - r, ly - r, P, R, L, f32)
    res = jnp.abs(cur - t).sum(axis=2).sum(axis=1, keepdims=True) / (P * P)
    z = jnp.zeros((N, 3), f32)
    out_ref[:] = jnp.concatenate([lx, ly, res, dn, det, z], axis=1)


@functools.partial(jax.jit, static_argnames=("iters", "patch", "search_wd",
                                             "block_n", "interpret", "eps"))
def lk_level_fused(win0, win1, aux, iters: int, patch: int, search_wd: int,
                   block_n: int = 32, interpret: bool = False,
                   eps: float = 0.01):
    """One pyramid level for all features in one kernel: template from win0
    at aux[:, 0:2], LK iterations over win1 from aux[:, 10:12] clamped to
    aux[:, 4:8]. Returns (N, 8): [lx, ly, residual, step_norm, det, 0...].
    """
    N, R, L = win1.shape
    P = patch
    pad = (-N) % block_n
    if pad:
        z = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        win0, win1, aux = map(z, (win0, win1, aux))
        Np = N + pad
    else:
        Np = N
    grid = Np // block_n
    kernel = functools.partial(_lk_level_kernel, iters=iters, P=P,
                               search_wd=search_wd, eps=eps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, 8), win1.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_n, R, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, R, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, AUX_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(win0, win1, aux)
    return out[:N]


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
