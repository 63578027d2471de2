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


def test_preprocess_matches_hf_clip_processor_embedding_level(rng):
    """Parity of the split host-crop + device-resize pipeline vs the
    reference's CLIPProcessor (resize-shortest-then-center-crop, bicubic,
    CLIP mean/std — app/ml/embeddings.py:85): on photo-like content the
    embedding-level drift through the same tower must sit inside the
    repo-wide <=1e-3 cosine budget. (Pure-noise images measure ~3e-3 —
    resampler disagreement on content with no low-frequency structure —
    which no realistic frame/photo exhibits.)"""

    import pytest

    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp

    from mmrag_tpu.models import bert, clip

    proc = transformers.CLIPImageProcessor()
    sizes = [(240, 320), (480, 270), (224, 224), (300, 300), (1080, 1920)]
    imgs = []
    for h, w in sizes:
        yy, xx = np.mgrid[0:h, 0:w]
        base = (127 + 80 * np.sin(xx / 47) + 40 * np.cos(yy / 31))[..., None]
        img = np.clip(base + rng.integers(-20, 20, (h, w, 1)), 0, 255)
        imgs.append(np.repeat(img.astype(np.uint8), 3, axis=2))
    want = proc(images=imgs, return_tensors="np")["pixel_values"].transpose(
        0, 2, 3, 1
    )
    got = np.asarray(preprocess_batch(jnp.asarray(stack_square_crops(imgs, 256))))
    params = clip.init_clip_params(jax.random.PRNGKey(1))
    f = jax.jit(lambda p, x: bert.l2_normalize(clip.clip_image_features(p, x)))
    ours = np.asarray(f(params, jnp.asarray(got)))
    ref = np.asarray(f(params, jnp.asarray(want.astype(np.float32))))
    drift = float((1.0 - (ours * ref).sum(-1)).max())
    assert drift <= 1e-3, drift
