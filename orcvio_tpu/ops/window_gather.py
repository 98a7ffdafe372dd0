"""Gather-free window extraction: block-decomposed one-hot matmuls.

Why: on the TPU backend, XLA lowers batched gathers / vmapped dynamic_slice
to a SEQUENTIAL while loop over slices (profiled: ~0.85 us per window,
~170-200 us per 200-feature extraction, 16+ extractions per front-end frame
— the dominant front-end cost and the vmap batch-scaling killer in rounds
1-2). The MXU-native alternative: decompose the image into its native
(8, 128) tiles and select each window's covering tile-block with ONE one-hot
matmul per channel — zero gathers, exact (one-hot weights are 0/1; pixels
split hi+lo into two bfloat16 passes, error <= 2^-17 of full scale), and a
single large matmul that batches perfectly under vmap (profiled 28.6 us per
200x(48,256) extraction vs 170 us for the while-loop gather).

On CPU (tests, x64) the same windows come from vmapped dynamic_slice —
bit-exact there and fast, keeping float64 test semantics.

Reference contract: the per-feature window reads of
cv::calcOpticalFlowPyrLK / cv::getRectSubPix (image_processor.cpp:568,628)
and ORBdescriptor patch reads (ORBDescriptor.cpp).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

BR, BL = 8, 128  # TPU f32 tile (sublane, lane)


def gather_impl() -> str:
    """Window-gather implementation: "dma" (TPU default — direct DMA copies,
    ops/dma_gather.py), "matmul" (one-hot block-select matmuls, the round-3
    design), or "slice" (vmapped dynamic_slice; CPU/tests)."""
    forced = os.environ.get("ORCVIO_GATHER_IMPL", "")
    if forced:
        return forced
    return "dma" if jax.default_backend() == "tpu" else "slice"


def _use_matmul_impl() -> bool:
    """Whether SUBPIXEL selection (klt.resample) should use one-hot matmuls
    (TPU) instead of per-feature dynamic slices (CPU). Independent of the
    window-gather impl: the resample one-hots are small and batch fine."""
    forced = os.environ.get("ORCVIO_RESAMPLE_IMPL", "")
    if forced:
        return forced == "matmul"
    return jax.default_backend() == "tpu"


class AlignedImage(struct.PyTreeNode):
    """Edge-padded, tile-aligned image prepared for window gathering."""
    blocks: jnp.ndarray | None       # (C, Hb*Wb, BR*BL) bf16 hi (TPU impl)
    blocks_lo: jnp.ndarray | None    # bf16 residual (f32x2 precision)
    padded: jnp.ndarray | None       # (C, Hp, Wp) full padded image (CPU impl)
    hb: int = struct.field(pytree_node=False)
    wb: int = struct.field(pytree_node=False)
    pad: int = struct.field(pytree_node=False)
    shape: tuple = struct.field(pytree_node=False)  # original (H, W)


def prepare_image(imgs, margin: int = 40, precision: str = "f32x2") -> AlignedImage:
    """Edge-pad imgs (C, H, W) by `margin`, align to (8, 128) tiles, and
    pre-tile for `gather_windows`. Do this once per image per frame and
    reuse across every extraction from it."""
    C, H, W = imgs.shape
    p = jnp.pad(imgs, ((0, 0), (margin, margin), (margin, margin)), mode="edge")
    Hp = -(-(H + 2 * margin) // BR) * BR
    Wp = max(-(-(W + 2 * margin) // BL) * BL, 2 * BL)
    p = jnp.pad(p, ((0, 0), (0, Hp - p.shape[1]), (0, Wp - p.shape[2])),
                mode="edge")
    hb, wb = Hp // BR, Wp // BL
    if gather_impl() != "matmul":
        # "dma" and "slice" both read the plain padded image — no hi/lo
        # bf16 split, no block re-tiling (two fewer full-image passes/frame)
        return AlignedImage(None, None, p, hb, wb, margin, (H, W))
    blocks = (p.reshape(C, hb, BR, wb, BL)
               .transpose(0, 1, 3, 2, 4)
               .reshape(C, hb * wb, BR * BL))
    lo = None
    if precision == "f32x2":
        hi = blocks.astype(jnp.bfloat16)
        lo = (blocks - hi.astype(blocks.dtype)).astype(jnp.bfloat16)
        blocks = hi
    elif precision == "bf16":
        blocks = blocks.astype(jnp.bfloat16)
    return AlignedImage(blocks, lo, None, hb, wb, margin, (H, W))


def _window_blocks(ai: AlignedImage, centers, t0: int):
    """Per-feature covering block origin (r0, c0) + window origin in image
    coords, for a logical window starting at floor(clamped center) + t0."""
    H, W = ai.shape
    dtype = centers.dtype
    cf = jnp.floor(centers)
    cy = jnp.clip(cf[:, 1], 0, H - 1)
    cx = jnp.clip(cf[:, 0], 0, W - 1)
    oy = cy.astype(jnp.int32) + (t0 + ai.pad)
    ox = cx.astype(jnp.int32) + (t0 + ai.pad)
    return oy, ox


def gather_windows(ai: AlignedImage, centers, t0: int, wd: int,
                   rows: int, lanes: int):
    """Extract per-feature aligned windows covering [floor(c)+t0, +wd).

    centers: (N, 2) float xy in ORIGINAL image coords. The logical wd-window
    starts at floor(clamped center) + t0 per axis; the returned aligned
    window starts at the enclosing (8, 128) tile boundary, so the logical
    window sits at a per-feature offset (dy in [0, 8), dx in [0, 128) except
    near the right edge where block clipping can push dx higher — always
    inside the returned extent).

    Returns (windows (C, N, rows, lanes) in centers.dtype, origin (N, 2)
    float xy of windows[..., 0, 0] in original image coords).
    """
    assert rows % BR == 0 and lanes % BL == 0
    assert rows >= wd + BR - 1, (rows, wd)
    assert lanes >= wd + BL - 1, (lanes, wd)
    nr, nl = rows // BR, lanes // BL
    N = centers.shape[0]
    dtype = centers.dtype
    oy, ox = _window_blocks(ai, centers, t0)
    r0 = jnp.clip(oy // BR, 0, ai.hb - nr)
    c0 = jnp.clip(ox // BL, 0, ai.wb - nl)
    origin = jnp.stack([(c0 * BL - ai.pad).astype(dtype),
                        (r0 * BR - ai.pad).astype(dtype)], axis=1)

    if ai.padded is not None:
        if gather_impl() == "dma":  # TPU: direct DMA copies (dma_gather.py)
            from .dma_gather import gather_one

            C = ai.padded.shape[-3]
            out = jnp.stack([
                gather_one(ai.padded[..., c, :, :], r0, c0,
                           rows // BR, lanes // BL)
                for c in range(C)
            ], axis=0)  # (C, N, rows, lanes); vmap batches inside gather_one
            return out.astype(dtype), origin
        # CPU impl: per-feature dynamic slices
        def one(r, c):
            z = jnp.zeros((), r.dtype)
            return jax.lax.dynamic_slice(
                ai.padded, (z, r * BR, c * BL),
                (ai.padded.shape[0], rows, lanes))
        out = jnp.swapaxes(jax.vmap(one)(r0, c0), 0, 1)
        return out.astype(dtype), origin

    C = ai.blocks.shape[0]
    ids = ((r0[:, None] + jnp.arange(nr, dtype=jnp.int32)[None, :])[:, :, None]
           * ai.wb
           + (c0[:, None] + jnp.arange(nl, dtype=jnp.int32)[None, :])[:, None, :])
    ids = ids.reshape(N * nr * nl)
    k = jnp.arange(ai.hb * ai.wb, dtype=jnp.int32)
    sel = (ids[:, None] == k[None, :]).astype(jnp.bfloat16)

    def mm(b):
        return jax.lax.dot_general(
            sel, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = jnp.stack([mm(ai.blocks[c]) for c in range(C)])
    if ai.blocks_lo is not None:
        out = out + jnp.stack([mm(ai.blocks_lo[c]) for c in range(C)])
    out = (out.reshape(C, N, nr, nl, BR, BL)
              .transpose(0, 1, 2, 4, 3, 5)
              .reshape(C, N, rows, lanes))
    return out.astype(dtype), origin


def crop_lanes(windows, lane_off, out_lanes: int):
    """Compact (N, rows, lanes) windows to (N, rows, out_lanes) starting at
    per-feature integer lane offsets.

    TPU: exact one-hot matmul (0/1 bf16 weights; pixels hi/lo split).
    CPU: per-feature dynamic slice."""
    N, R, L = windows.shape
    if not _use_matmul_impl():
        # zero-pad right so offsets in (L-out, L] slice cleanly, matching the
        # matmul path's zero fill for source lanes >= L
        wp = jnp.pad(windows, ((0, 0), (0, 0), (0, out_lanes)))
        off = jnp.clip(lane_off, 0, L)
        return jax.vmap(
            lambda w, o: jax.lax.dynamic_slice(
                w, (jnp.zeros((), o.dtype), o), (R, out_lanes))
        )(wp, off)
    k = jnp.arange(L, dtype=jnp.int32)
    j = jnp.arange(out_lanes, dtype=jnp.int32)
    sel = (k[None, :, None] == (lane_off[:, None, None] + j[None, None, :]))
    sel_hi = sel.astype(jnp.bfloat16)
    win_hi = windows.astype(jnp.bfloat16)
    win_lo = (windows - win_hi.astype(windows.dtype)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        win_hi, sel_hi, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(
        win_lo, sel_hi, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out.astype(windows.dtype)
