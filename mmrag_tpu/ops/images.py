"""Device-side image preprocessing for the CLIP vision tower.

The reference runs PIL decode + ``CLIPProcessor`` resize/center-crop/normalize
serially on host per image (``/root/reference/app/ml/embeddings.py:84-85``).
Here preprocessing is split TPU-first:

  * Host does only what needs dynamic shapes: decode + centered-square crop
    (a slice, no resampling). CLIP's shortest-side-resize-then-center-crop is
    geometrically identical to cropping the largest centered square and
    resizing it, so no information is lost by cropping first.
  * Device (jitted, fuseable into the CLIP forward): bicubic resize to
    224x224, scale to [0,1], normalize with CLIP mean/std. Batches transfer
    as uint8 (4x less host->device traffic than f32).

For video frames — which share one static shape per video — the whole
pipeline (resize included) runs on device with no per-frame host work.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_SIZE = 224
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def center_square_crop(image: np.ndarray) -> np.ndarray:
    """Host-side largest centered square crop of an (h, w, 3) uint8 array."""

    h, w = image.shape[:2]
    side = min(h, w)
    top = (h - side) // 2
    left = (w - side) // 2
    return image[top : top + side, left : left + side]


@jax.jit
def preprocess_batch(images: jnp.ndarray) -> jnp.ndarray:
    """(b, s, s, 3) uint8 square crops -> (b, 224, 224, 3) f32 normalized."""

    x = images.astype(jnp.float32)
    if images.shape[1] != CLIP_IMAGE_SIZE or images.shape[2] != CLIP_IMAGE_SIZE:
        x = jax.image.resize(
            x,
            (x.shape[0], CLIP_IMAGE_SIZE, CLIP_IMAGE_SIZE, 3),
            method="cubic",
            antialias=True,
        )
    x = x / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def stack_square_crops(images: Sequence[np.ndarray], canvas: int = 256) -> np.ndarray:
    """Host: crop each image to its centered square and resize to one static
    canvas so a batch has a single shape. Uses area-style resize via PIL-free
    numpy striding only when exact (integer factor); otherwise defers to the
    device bicubic by padding... in practice we resize on host with cv2 when
    available, else nearest via numpy indexing.

    Returns (b, canvas, canvas, 3) uint8.
    """

    out = np.empty((len(images), canvas, canvas, 3), dtype=np.uint8)
    for i, img in enumerate(images):
        sq = center_square_crop(np.asarray(img))
        out[i] = _host_resize(sq, canvas)
    return out


def _host_resize(square: np.ndarray, size: int) -> np.ndarray:
    side = square.shape[0]
    if side == size:
        return square
    try:
        import cv2

        interp = cv2.INTER_AREA if side > size else cv2.INTER_CUBIC
        return cv2.resize(square, (size, size), interpolation=interp)
    except ImportError:
        idx = (np.arange(size) * (side / size)).astype(np.int64).clip(0, side - 1)
        return square[idx][:, idx]


def prepare_image_batch(
    images: Sequence[np.ndarray], canvas: int = 256
) -> Tuple[np.ndarray, int]:
    """Host stage for mixed-size images: returns (b, canvas, canvas, 3) uint8
    plus the count; callers pad the batch dim to a bucket before jit."""

    stacked = stack_square_crops(images, canvas)
    return stacked, len(images)
