"""Rotated-BRIEF binary descriptors + Hamming distance gate.

TPU-native equivalent of the reference's ORB_SLAM2-derived descriptor stage
(``src/ORBDescriptor.cpp``, gated at Hamming distance <= 58,
image_processor.cpp:463,707). The descriptor only gates OUR OWN tracks
frame-to-frame, so cross-compatibility with OpenCV's sampling pattern is not
needed: we use a seeded Gaussian 256-pair pattern (the same construction the
BRIEF/ORB papers describe), orientation from the intensity centroid, and
bit-packed uint32 descriptors compared by popcount.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .klt import extract_patches

N_BITS = 256
PATCH_R = 15.0
_P = 33  # patch side: radius 15 pattern + 1 texel margin for bilinear taps
_R = _P // 2


def make_pattern(seed: int = 42):
    """(256, 4) sampling pairs (x1, y1, x2, y2), Gaussian sigma = r/2, clipped."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH_R / 2.0, size=(N_BITS, 4))
    return jnp.asarray(np.clip(pts, -PATCH_R, PATCH_R), jnp.float32)


_PATTERN = make_pattern()


def _keypoint_patches(img, xy):
    """(N, 33, 33) pixel patches via separable one-hot matmuls (no gathers —
    see klt.py's design note; scattered gathers are the TPU slow path)."""
    taps = np.arange(-_R, _R + 1)
    return extract_patches(img, xy, taps)


def _orientation_from_patches(patches, dtype):
    o = jnp.arange(-_R, _R + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(o, o, indexing="ij")
    circ = ((ox * ox + oy * oy) <= PATCH_R * PATCH_R).astype(dtype)
    m10 = jnp.sum(patches * (ox * circ)[None], axis=(1, 2))
    m01 = jnp.sum(patches * (oy * circ)[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def orientation(img, xy, radius: int = 15):
    """Intensity-centroid orientation per keypoint (IC_Angle in ORB)."""
    del radius  # fixed by the patch size
    patches = _keypoint_patches(img, xy)
    return _orientation_from_patches(patches, patches.dtype)


def _sample_in_patch(patches, pts):
    """Bilinear sample (N, M, 2) patch-frame points from (N, P, P) patches
    via per-point one-hot weights (small einsums, MXU-friendly). Default
    matmul precision: descriptor bits are robust to ~0.5-gray rounding (the
    Hamming gate allows 58/256 mismatches), so the bf16 MXU pass suffices."""
    dtype = patches.dtype
    c = jnp.clip(pts + _R, 0.0, _P - 1.001)  # patch coords
    c0 = jnp.floor(c)
    f = c - c0
    k = jnp.arange(_P, dtype=dtype)
    wy = ((k == c0[..., 1:2]) * (1 - f[..., 1:2]) + (k == c0[..., 1:2] + 1) * f[..., 1:2])
    wx = ((k == c0[..., 0:1]) * (1 - f[..., 0:1]) + (k == c0[..., 0:1] + 1) * f[..., 0:1])
    rows = jnp.einsum("nmh,nhw->nmw", wy.astype(dtype), patches)  # (N, M, P)
    return jnp.sum(rows * wx.astype(dtype), axis=-1)  # (N, M)


def describe(img, xy, angles=None, pattern=_PATTERN):
    """Compute descriptors: (N, 8) uint32 (256 bits). img may be a raw
    (H, W) image or a prepared ops.window_gather.AlignedImage."""
    patches = _keypoint_patches(img, xy)
    if angles is None:
        angles = _orientation_from_patches(patches, patches.dtype)
    c = jnp.cos(angles)[:, None]
    s = jnp.sin(angles)[:, None]

    def rot(p):  # (256, 2) pattern points -> (N, 256, 2) rotated
        return jnp.stack(
            [c * p[None, :, 0] - s * p[None, :, 1],
             s * p[None, :, 0] + c * p[None, :, 1]], axis=-1)

    v1 = _sample_in_patch(patches, rot(pattern[:, 0:2]))
    v2 = _sample_in_patch(patches, rot(pattern[:, 2:4]))
    bits = v1 < v2  # (N, 256)
    words = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(jnp.where(words, weights, jnp.uint32(0)), axis=-1, dtype=jnp.uint32)


def hamming(d1, d2):
    """Bitwise Hamming distance between (N, 8) uint32 descriptor arrays."""
    x = jnp.bitwise_xor(d1, d2)
    # SWAR popcount: lax.population_count lowers poorly on TPU for u32
    v = x - ((x >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    per_word = (v * jnp.uint32(0x01010101)) >> 24
    return jnp.sum(per_word.astype(jnp.int32), axis=-1)
