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

from .image import bilinear_sample

N_BITS = 256
PATCH_R = 15.0


def make_pattern(seed: int = 42):
    """(256, 4) sampling pairs (x1, y1, x2, y2), Gaussian sigma = r/2, clipped."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH_R / 2.0, size=(N_BITS, 4))
    return jnp.asarray(np.clip(pts, -PATCH_R, PATCH_R), jnp.float32)


_PATTERN = make_pattern()


def orientation(img, xy, radius: int = 15):
    """Intensity-centroid orientation per keypoint (IC_Angle in ORB)."""
    r = radius
    o = jnp.arange(-r, r + 1, dtype=img.dtype)
    oy, ox = jnp.meshgrid(o, o, indexing="ij")
    circ = (ox * ox + oy * oy) <= r * r
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=1)
    w = circ.reshape(-1).astype(img.dtype)

    def per_kp(p):
        vals = bilinear_sample(img, p[None, :] + offs) * w
        m10 = jnp.sum(vals * offs[:, 0])
        m01 = jnp.sum(vals * offs[:, 1])
        return jnp.arctan2(m01, m10)

    return jax.vmap(per_kp)(xy)


def describe(img, xy, angles=None, pattern=_PATTERN):
    """Compute descriptors: (N, 8) uint32 (256 bits)."""
    if angles is None:
        angles = orientation(img, xy)
    c = jnp.cos(angles)
    s = jnp.sin(angles)

    def per_kp(p, cc, ss):
        R = jnp.asarray([[cc, -ss], [ss, cc]])
        p1 = (pattern[:, 0:2] @ R.T) + p[None, :]
        p2 = (pattern[:, 2:4] @ R.T) + p[None, :]
        bits = bilinear_sample(img, p1) < bilinear_sample(img, p2)  # (256,)
        words = bits.reshape(8, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
        return jnp.sum(jnp.where(words, weights, jnp.uint32(0)), axis=1, dtype=jnp.uint32)

    return jax.vmap(per_kp)(xy, c, s)


def hamming(d1, d2):
    """Bitwise Hamming distance between (N, 8) uint32 descriptor arrays."""
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jax.lax.population_count(x), axis=-1)
