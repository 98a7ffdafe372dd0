"""Integer-origin window extraction: the front end's patch/window gather.

Every patch read in the front end (KLT templates, LK search windows, ORB
patches) reduces to "copy a (wd, wd) window at a per-feature integer origin
out of a full image", followed by tiny in-window bilinear resamples.

Formulation notes (measured on v5e, 256 windows of 24x16 from 528x896 f32):
  * scattered 4-tap bilinear gathers over the full image: the TPU slow path
    (~660 ms/frame in the round-1 tracker) — never do this;
  * full-image one-hot matmuls (round-2 first cut): correct but burns MXU
    time materializing (N*P, H) one-hot operators — 31 us at bf16, ~6x that
    under the `highest` precision the resample needs;
  * vmapped `lax.dynamic_slice` windows: 21 us, zero FLOPs, no alignment
    constraints, bit-identical on CPU and TPU.  XLA lowers the vmapped
    dynamic-slice to an efficient per-window copy; a hand-written Pallas DMA
    kernel was tried and abandoned — Mosaic requires 8-sublane/128-lane
    aligned HBM slice origins, and padding windows to (8, 128) tiles costs
    more bandwidth than the XLA copy.

So: windows come from vmapped dynamic_slice; only the tiny in-window
subpixel resample (klt._local_sample) uses one-hot matmuls over the window.

Reference contract: cv::calcOpticalFlowPyrLK's per-feature window reads and
ORBdescriptor's patch reads (image_processor.cpp:568,628; ORBDescriptor.cpp).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_windows(imgs, oy, ox, wdy: int, wdx: int):
    """Copy per-feature (wdy, wdx) windows from a stack of images.

    imgs: (C, H, W); oy/ox: (N,) int32 origins with the full extent in
    bounds. Returns (C, N, wdy, wdx).
    """
    def one(y0, x0):
        return jax.vmap(
            lambda im: jax.lax.dynamic_slice(im, (y0, x0), (wdy, wdx))
        )(imgs)

    return jnp.swapaxes(jax.vmap(one)(oy, ox), 0, 1)


def padded_windows(imgs, centers, t0: int, wd: int):
    """Edge-padded integer-origin windows around subpixel centers.

    imgs: (C, H, W); centers: (N, 2) xy. Each window starts at
    floor(center) + t0 (center clamped into the image) and spans wd pixels
    per axis; the images are edge-padded so windows never clip —
    out-of-image rows/cols replicate the border, matching the
    clamp-coordinate semantics of full-image bilinear sampling (and of
    cv::BORDER_REPLICATE in the reference's pyramids).

    Returns (windows (C, N, wd, wd), origin (N, 2) float xy) where origin
    is the window's (0, 0) in unpadded image coordinates.
    """
    C, H, W = imgs.shape
    pad = wd - 1
    imgs_p = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    cf = jnp.floor(centers)
    cy = jnp.clip(cf[:, 1], 0, H - 1)
    cx = jnp.clip(cf[:, 0], 0, W - 1)
    oy = (cy + (t0 + pad)).astype(jnp.int32)
    ox = (cx + (t0 + pad)).astype(jnp.int32)
    origin = jnp.stack(
        [ox.astype(centers.dtype) - pad, oy.astype(centers.dtype) - pad], axis=1)
    return extract_windows(imgs_p, oy, ox, wd, wd), origin
