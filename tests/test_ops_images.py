"""Device image preprocess: geometry, normalization, batch stacking."""

import jax.numpy as jnp
import numpy as np

from mmrag_tpu.ops.images import (
    CLIP_MEAN,
    CLIP_STD,
    center_square_crop,
    preprocess_batch,
    stack_square_crops,
)


def test_center_square_crop_geometry():
    img = np.zeros((100, 60, 3), dtype=np.uint8)
    img[20:80, :, 0] = 255  # centered band
    sq = center_square_crop(img)
    assert sq.shape == (60, 60, 3)
    assert sq[:, :, 0].mean() == 255  # crop landed on the band
    wide = center_square_crop(np.zeros((50, 130, 3), dtype=np.uint8))
    assert wide.shape == (50, 50, 3)


def test_preprocess_shapes_and_normalization():
    flat = np.full((2, 256, 256, 3), 128, dtype=np.uint8)
    out = np.asarray(preprocess_batch(jnp.asarray(flat)))
    assert out.shape == (2, 224, 224, 3)
    want = (128 / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out[0, 112, 112], want, atol=1e-4)


def test_preprocess_224_passthrough_no_resize():
    x = np.zeros((1, 224, 224, 3), dtype=np.uint8)
    out = np.asarray(preprocess_batch(jnp.asarray(x)))
    np.testing.assert_allclose(out[0, 0, 0], (0 - CLIP_MEAN) / CLIP_STD, atol=1e-5)


def test_stack_square_crops_mixed_sizes(rng):
    imgs = [
        rng.integers(0, 255, (80, 120, 3)).astype(np.uint8),
        rng.integers(0, 255, (300, 200, 3)).astype(np.uint8),
        rng.integers(0, 255, (256, 256, 3)).astype(np.uint8),
    ]
    batch = stack_square_crops(imgs, canvas=256)
    assert batch.shape == (3, 256, 256, 3) and batch.dtype == np.uint8
    np.testing.assert_array_equal(batch[2], imgs[2])  # exact size passes through
