"""Batched perceptual hash (pHash) + Hamming dedup as jitted TPU ops.

Replaces the reference's per-frame ``imagehash.phash`` + O(n^2) Python dedup
loop (``/root/reference/app/ingest/frames.py:87-95``) with a batched device
pipeline: grayscale -> 32x32 resize -> 2-D DCT-II (as two MXU matmuls against
a precomputed DCT basis) -> top-left 8x8 low-frequency block -> median
threshold -> 64-bit hash. The greedy keep-first dedup runs as a
``fori_loop`` over a device-computed Hamming matrix (itself two matmuls), so
the whole thing is one dispatch regardless of frame count.

Algorithm matches imagehash.phash (hash_size=8, highfreq_factor=4); bit-exact
parity is not guaranteed because resize filters differ (lanczos3 here vs PIL
LANCZOS), but Hamming distances track within the dedup delta in practice.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HASH_SIZE = 8
DCT_SIZE = 32  # hash_size * highfreq_factor

# ITU-R 601-2 luma transform — same as PIL Image.convert("L").
_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: (D @ x) along axis 0 computes scipy
    ``dct(x, axis=0, norm=None)`` up to per-row scale; scale does not affect
    the median-threshold bits, so we use the orthonormal form for stability."""

    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * math.sqrt(2.0 / n)
    d[0] *= 1.0 / math.sqrt(2.0)
    return d.astype(np.float32)


_DCT = _dct_matrix(DCT_SIZE)


@jax.jit
def phash_batch(images: jnp.ndarray) -> jnp.ndarray:
    """Compute 64-bit pHashes for a batch of images.

    Args:
      images: (b, h, w, 3) uint8 or float RGB (any static h, w).
    Returns:
      (b, 64) float32 bit matrix (0.0 / 1.0) — kept as floats so Hamming
      distances are MXU matmuls.
    """

    gray = jnp.einsum("bhwc,c->bhw", images.astype(jnp.float32), jnp.asarray(_LUMA))
    small = jax.image.resize(
        gray, (gray.shape[0], DCT_SIZE, DCT_SIZE), method="lanczos3", antialias=True
    )
    dct_mat = jnp.asarray(_DCT)
    # 2-D DCT-II: rows then columns, batched on the MXU.
    freq = jnp.einsum("ij,bjk,lk->bil", dct_mat, small, dct_mat)
    low = freq[:, :HASH_SIZE, :HASH_SIZE].reshape(images.shape[0], HASH_SIZE * HASH_SIZE)
    med = jnp.median(low, axis=1, keepdims=True)
    return (low > med).astype(jnp.float32)


@jax.jit
def hamming_matrix(bits: jnp.ndarray) -> jnp.ndarray:
    """(n, 64) bit matrix -> (n, n) pairwise Hamming distances via matmuls."""

    ones = 1.0 - bits
    d = jnp.dot(bits, ones.T, preferred_element_type=jnp.float32)
    return d + d.T


@functools.partial(jax.jit, static_argnames=())
def greedy_dedup_mask(distances: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Keep-first greedy dedup (reference ``frames.py:87-95`` semantics).

    Frame i is kept iff its Hamming distance to every *kept* earlier frame
    exceeds ``delta``. Returns a (n,) bool mask. Runs as a fori_loop on
    device — one dispatch for the whole sequence.
    """

    n = distances.shape[0]

    def body(i, kept):
        dup = jnp.any(kept & (distances[i] <= delta) & (jnp.arange(n) < i))
        return kept.at[i].set(~dup)

    kept0 = jnp.zeros(n, dtype=bool).at[0].set(n > 0)
    return jax.lax.fori_loop(1, n, body, kept0)


# frames per phash dispatch: bounds the (chunk, h, w) f32 grayscale +
# lanczos transients to ~0.5 GB at 1080p instead of growing with video
# length (review finding: a one-shot phash over a long video's full stack
# was the same unbounded-transient class _SCENE_CHUNK fixed for the
# histogram pass). One static shape -> one compile (tail padded).
_PHASH_CHUNK = 32


def dedup_frames(
    images, delta: int, max_keep: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline: phash -> Hamming -> greedy mask -> cap at max_keep.

    ``images`` is (n, h, w, 3) uint8 (np or device array). Hashing runs in
    fixed-size chunks so device transients stay bounded at any video
    length; the (n, 64) bit matrix is tiny, so the Hamming + greedy passes
    are one dispatch. Returns (kept_indices (m,), bits (n, 64)) as NumPy.
    The cap mirrors the reference's ``max_frames`` truncation
    (``frames.py:108-109``).
    """

    images = np.asarray(images)
    n = images.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros((0, 64), dtype=np.float32)
    bits_l = []
    for lo in range(0, n, _PHASH_CHUNK):
        chunk = images[lo : lo + _PHASH_CHUNK]
        pad = _PHASH_CHUNK - chunk.shape[0]
        if pad and n > _PHASH_CHUNK:  # keep the tail on the same executable
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, axis=0)])
            bits_l.append(
                np.asarray(phash_batch(jnp.asarray(chunk)))[: -pad or None]
            )
        else:
            bits_l.append(np.asarray(phash_batch(jnp.asarray(chunk))))
    bits = np.concatenate(bits_l)
    dist = hamming_matrix(jnp.asarray(bits))
    mask = greedy_dedup_mask(dist, jnp.float32(delta))
    kept = np.flatnonzero(np.asarray(mask))[:max_keep]
    return kept, bits
