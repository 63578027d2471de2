"""Public embedding API — reference-compatible signatures.

Mirrors ``/root/reference/app/ml/embeddings.py:52-105``:
``embed_text_batch(texts) -> (n, 384)``, ``embed_images_batch(paths) ->
(n, 512)``, ``embed_query_for_images(query) -> (512,)`` — all L2-normalized
f32 numpy. Implementation delegates to the bucketed jitted
:class:`~mmrag_tpu.models.runtime.EncoderRuntime` instead of torch minibatch
loops; ``batch_size`` kwargs are accepted for drop-in compatibility but
superseded by the static batch buckets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..models.runtime import get_runtime


def embed_text_batch(texts: Sequence[str], batch_size: Optional[int] = None) -> np.ndarray:
    return get_runtime().embed_text_batch(texts)


def embed_images_batch(paths: Sequence[str], batch_size: Optional[int] = None) -> np.ndarray:
    return get_runtime().embed_image_files(paths)


def embed_image_arrays(images: Sequence[np.ndarray]) -> np.ndarray:
    """Array-input variant used by the streaming frames pipeline (no reference
    equivalent — the reference re-reads files per batch)."""

    return get_runtime().embed_images_batch(images)


def embed_query_for_images(query: str) -> np.ndarray:
    return get_runtime().embed_query_for_images(query)
