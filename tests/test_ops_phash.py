"""pHash + Hamming dedup: invariance, discrimination, greedy-mask semantics."""

import jax.numpy as jnp
import numpy as np

from mmrag_tpu.ops.phash import (
    dedup_frames,
    greedy_dedup_mask,
    hamming_matrix,
    phash_batch,
)


def _gradient_img(rng, h=64, w=64):
    # Structured content (random low-res blocks upsampled) — pHash bits are
    # stable under pixel noise only when the spectrum has real structure.
    blocks = rng.integers(0, 255, (8, 8, 3)).astype(np.float32)
    img = np.kron(blocks, np.ones((h // 8, w // 8, 1), dtype=np.float32))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_identical_images_zero_distance(rng):
    img = _gradient_img(rng)
    batch = jnp.asarray(np.stack([img, img]))
    bits = phash_batch(batch)
    assert bits.shape == (2, 64)
    d = np.asarray(hamming_matrix(bits))
    assert d[0, 1] == 0


def test_noise_robust_but_discriminative(rng):
    img = _gradient_img(rng)
    noisy = np.clip(img.astype(np.int32) + rng.integers(-6, 6, img.shape), 0, 255).astype(
        np.uint8
    )
    different = np.transpose(img, (1, 0, 2))  # rotated gradient = structurally different
    bits = phash_batch(jnp.asarray(np.stack([img, noisy, different])))
    d = np.asarray(hamming_matrix(bits))
    assert d[0, 1] <= 6  # near-dup within reference delta
    assert d[0, 2] > 10  # structurally different far away


def test_greedy_mask_matches_python_reference(rng):
    n = 12
    dist = rng.integers(0, 20, (n, n)).astype(np.float32)
    dist = (dist + dist.T) / 2
    np.fill_diagonal(dist, 0)
    delta = 6.0

    kept_py = []
    for i in range(n):
        if all(dist[i, j] > delta for j in kept_py):
            kept_py.append(i)
    mask = np.asarray(greedy_dedup_mask(jnp.asarray(dist), jnp.float32(delta)))
    assert list(np.flatnonzero(mask)) == kept_py


def test_dedup_frames_pipeline(rng):
    img_a = _gradient_img(rng)
    img_b = np.transpose(img_a, (1, 0, 2)).copy()
    frames = jnp.asarray(np.stack([img_a, img_a, img_b, img_a, img_b]))
    kept, bits = dedup_frames(frames, delta=6, max_keep=10)
    assert list(kept) == [0, 2]
    assert bits.shape == (5, 64)
    kept_capped, _ = dedup_frames(frames, delta=-1, max_keep=3)  # delta<0 keeps all
    assert len(kept_capped) == 3


def test_dedup_empty():
    kept, bits = dedup_frames(jnp.zeros((0, 8, 8, 3), dtype=jnp.uint8), 6, 10)
    assert kept.size == 0 and bits.shape == (0, 64)
