"""DMA window gather (ops/dma_gather.py), interpret mode on CPU.

The TPU production path is exercised by the bench/e2e replay; these pin the
kernel's copy semantics: exact content, ragged feature counts (grid padding
re-copies, never reads junk), and multi-image batching (the custom_vmap
rule's flattened index plumbing).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.ops.dma_gather import BR, BL, dma_gather_tiles

RNG = np.random.default_rng(3)


def _truth(imgs, r0, c0, b, nr, nl):
    return np.stack([
        np.asarray(imgs)[bb, BR*a:BR*(a+nr), BL*c:BL*(c+nl)]
        for bb, a, c in zip(np.asarray(b), np.asarray(r0), np.asarray(c0))
    ])


@pytest.mark.parametrize("n", [1, 7, 64, 65, 200])
def test_exact_copy_ragged(n):
    imgs = jnp.asarray(RNG.normal(size=(1, 560, 896)).astype(np.float32))
    r0 = jnp.asarray(RNG.integers(0, 560 // BR - 6, n), jnp.int32)
    c0 = jnp.asarray(RNG.integers(0, 896 // BL - 2, n), jnp.int32)
    b = jnp.zeros((n,), jnp.int32)
    out = dma_gather_tiles(imgs, r0, c0, b, 6, 2, bn=64, interpret=True)
    assert out.shape == (n, 48, 256)
    np.testing.assert_array_equal(np.asarray(out), _truth(imgs, r0, c0, b, 6, 2))


def test_multi_image_index():
    imgs = jnp.asarray(RNG.normal(size=(3, 560, 896)).astype(np.float32))
    n = 90
    r0 = jnp.asarray(RNG.integers(0, 560 // BR - 4, n), jnp.int32)
    c0 = jnp.asarray(RNG.integers(0, 896 // BL - 1, n), jnp.int32)
    b = jnp.asarray(RNG.integers(0, 3, n), jnp.int32)
    out = dma_gather_tiles(imgs, r0, c0, b, 4, 1, bn=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _truth(imgs, r0, c0, b, 4, 1))


def test_small_extent():
    """Template-sized (16, 256) windows (extract_patches path)."""
    imgs = jnp.asarray(RNG.normal(size=(1, 560, 896)).astype(np.float32))
    n = 40
    r0 = jnp.asarray(RNG.integers(0, 560 // BR - 2, n), jnp.int32)
    c0 = jnp.asarray(RNG.integers(0, 896 // BL - 2, n), jnp.int32)
    b = jnp.zeros((n,), jnp.int32)
    out = dma_gather_tiles(imgs, r0, c0, b, 2, 2, bn=40, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _truth(imgs, r0, c0, b, 2, 2))
