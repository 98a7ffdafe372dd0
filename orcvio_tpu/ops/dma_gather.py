"""Per-feature window extraction as direct DMA copies (one Pallas kernel).

Round-5 measurement (fixed-jit, varying-args scans on the real chip): the
one-hot block-select matmul of ops/window_gather.py costs ~43 us per
200-feature (48, 256) extraction per bf16 pass — the production "f32x2"
path needs two passes plus a two-pass crop_lanes, and the MXU work scales
with batch, which is exactly why the round-4 batched replay stopped scaling
(B=4 gave 1.19x). This kernel moves the same windows in ~50 us with ZERO
matmul FLOPs and exact f32 in ONE pass: each grid step issues `bn` async
HBM->VMEM copies whose (8, 128)-aligned origins come from scalar-prefetched
block indices, then waits. (A BlockSpec-indexed variant — one (8,128) tile
per grid step — measured 10x worse, 447 us/extraction: per-grid-step
overhead dominates at 2400 steps.)

Used by ops/window_gather.gather_windows when the gather impl is "dma"
(the TPU default from round 5). vmap (the batched replay) is supported via
jax.custom_batching: the batched rule flattens (B, N) windows into B*N
copies with a per-window image index — different windows of one kernel
launch may read different images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR, BL = 8, 128  # f32 tile (sublane, lane)


def _dma_kernel(r0_ref, c0_ref, bidx_ref, img_ref, out_ref, sems, *,
                bn: int, nr: int, nl: int, n: int):
    """Copy bn windows per grid step: img[b, 8*r0 : 8*(r0+nr),
    128*c0 : 128*(c0+nl)] -> out[u]. Feature index clamped to n-1 so a
    ragged last step re-copies valid windows instead of reading junk."""
    i0 = pl.program_id(0) * bn
    for u in range(bn):
        f = jnp.minimum(i0 + u, n - 1)
        pltpu.make_async_copy(
            img_ref.at[bidx_ref[f],
                       pl.ds(r0_ref[f] * BR, nr * BR),
                       pl.ds(c0_ref[f] * BL, nl * BL)],
            out_ref.at[u], sems.at[u]).start()
    for u in range(bn):
        f = jnp.minimum(i0 + u, n - 1)
        pltpu.make_async_copy(
            img_ref.at[bidx_ref[f],
                       pl.ds(r0_ref[f] * BR, nr * BR),
                       pl.ds(c0_ref[f] * BL, nl * BL)],
            out_ref.at[u], sems.at[u]).wait()


@functools.partial(jax.jit, static_argnames=("nr", "nl", "bn", "interpret"))
def dma_gather_tiles(imgs, r0, c0, bidx, nr: int, nl: int, bn: int = 64,
                     interpret: bool = False):
    """Gather (N, nr*8, nl*128) windows from (B, Hp, Wp) tile-aligned images.

    imgs: (B, Hp, Wp) with Hp % 8 == 0, Wp % 128 == 0; r0/c0: (N,) int32
    window block origins (units of 8 rows / 128 lanes, caller-clipped
    in-range); bidx: (N,) int32 image index of each window.
    """
    N = r0.shape[0]
    bn = min(bn, N)
    grid = -(-N // bn)
    rows, lanes = nr * BR, nl * BL
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bn, rows, lanes),
                               lambda i, r0, c0, b: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((bn,))],
    )
    out = pl.pallas_call(
        functools.partial(_dma_kernel, bn=bn, nr=nr, nl=nl, n=N),
        out_shape=jax.ShapeDtypeStruct((grid * bn, rows, lanes), imgs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(r0, c0, bidx, imgs)
    return out[:N]


@functools.lru_cache(maxsize=None)
def _make_gather(nr: int, nl: int):
    """vmap-aware single-image gather for a fixed window extent."""

    @custom_batching.custom_vmap
    def gather(padded, r0, c0):
        bidx = jnp.zeros(r0.shape, jnp.int32)
        return dma_gather_tiles(padded[None], r0, c0, bidx, nr, nl)

    @gather.def_vmap
    def _rule(axis_size, in_batched, padded, r0, c0):  # noqa: ANN001
        pb, rb, cb = in_batched
        B = axis_size
        N = r0.shape[-1]
        r0_b = r0 if rb else jnp.broadcast_to(r0, (B, N))
        c0_b = c0 if cb else jnp.broadcast_to(c0, (B, N))
        if pb:
            imgs = padded
            bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
        else:
            imgs = padded[None]
            bidx = jnp.zeros((B * N,), jnp.int32)
        out = dma_gather_tiles(imgs, r0_b.reshape(-1), c0_b.reshape(-1),
                               bidx, nr, nl)
        return out.reshape(B, N, nr * BR, nl * BL), True

    return gather


def gather_one(padded, r0, c0, nr: int, nl: int):
    """(N, nr*8, nl*128) windows from one (Hp, Wp) image; safe under vmap."""
    return _make_gather(nr, nl)(padded, r0, c0)
