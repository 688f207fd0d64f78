"""DCT perceptual hashing, batched on device.

Replaces the reference's per-image ``imagehash.phash`` (PIL + scipy,
``filter_research_update.py:97-99``). Same algorithm family: grayscale ->
32x32 resize -> 2D DCT-II -> top-left 8x8 low-frequency block -> bits =
coefficient > median over all 64 low-frequency coefficients (including
DC — imagehash.phash's semantics; the dedup threshold 5 carried from the
reference was tuned for that cut).

The DCT is two matmuls with the orthonormal DCT basis — MXU work — so the
whole corpus hashes in a handful of batched launches. Hashes are returned as
(B, 64) uint8 bit arrays (no uint64 dependence; JAX x64 stays off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import resize_bilinear
from .quality import rgb_to_gray

__all__ = ["perceptual_hash", "hamming_distance", "phash_dedup_mask"]

_HASH_DIM = 32
_LOW_FREQ = 8


@functools.lru_cache(maxsize=4)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n, n): X = C @ x @ C^T."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    basis[0] *= 1.0 / np.sqrt(2.0)
    return (basis * np.sqrt(2.0 / n)).astype(np.float32)


@jax.jit
def _phash_impl(gray32: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(_dct_basis(_HASH_DIM))
    # batched 2D DCT: C @ img @ C^T
    coeffs = jnp.einsum("ij,bjk,lk->bil", c, gray32, c)
    low = coeffs[:, :_LOW_FREQ, :_LOW_FREQ].reshape(-1, _LOW_FREQ * _LOW_FREQ)
    # median over ALL 64 low-frequency coefficients, DC included — matching
    # imagehash.phash so the reference-tuned threshold transfers
    med = jnp.median(low, axis=1, keepdims=True)
    return (low > med).astype(jnp.uint8)


@jax.jit
def perceptual_hash(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) pixels in [0,255] -> (B, 64) uint8 bits."""
    gray = rgb_to_gray(images)[..., None]          # (B,H,W,1)
    gray32 = resize_bilinear(gray, _HASH_DIM, _HASH_DIM)[..., 0]
    return _phash_impl(gray32)


@jax.jit
def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances between bit arrays.

    a (M, 64), b (N, 64) -> (M, N) int32. For 64-bit hashes this is a
    small matmul-shaped reduce; fine on VPU.
    """
    af = a.astype(jnp.int32)[:, None, :]
    bf = b.astype(jnp.int32)[None, :, :]
    return jnp.sum(af ^ bf, axis=-1)


def phash_dedup_mask(hashes: jnp.ndarray, threshold: int = 5) -> np.ndarray:
    """Sequential prefilter: drop a frame whose hash is within ``threshold``
    bits of the previously *kept* frame (reference semantics,
    ``filter_research_update.py:157-162``). Returns a keep mask (host numpy,
    sequential scan — cheap at 64 bits/frame)."""
    h = np.asarray(hashes)
    n = len(h)
    keep = np.ones(n, dtype=bool)
    if n == 0:
        return keep
    last = h[0]
    for i in range(1, n):
        if int(np.sum(h[i] != last)) <= threshold:
            keep[i] = False
        else:
            last = h[i]
    return keep
