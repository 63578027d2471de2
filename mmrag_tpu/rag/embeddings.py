"""Public embedding API — reference-compatible signatures + the query
embed-cache/coalescing layer.

Mirrors ``/root/reference/app/ml/embeddings.py:52-105``:
``embed_text_batch(texts) -> (n, 384)``, ``embed_images_batch(paths) ->
(n, 512)``, ``embed_query_for_images(query) -> (512,)`` — all L2-normalized
f32 numpy. Implementation delegates to the bucketed jitted
:class:`~mmrag_tpu.models.runtime.EncoderRuntime` instead of torch minibatch
loops; ``batch_size`` kwargs are accepted for drop-in compatibility but
superseded by the static batch buckets.

This module also owns the serving-side query embedding policy — the role of
the reference's ``_get_embeddings`` (``app/ml/retrieve.py:120-129``): probe
the TTL embed cache, else produce BOTH query towers (MiniLM 384-d + CLIP
text 512-d), routed through the cross-request
:class:`~mmrag_tpu.serving.batcher.QueryEmbedBatcher` when the engine has
one so concurrent requests share a single padded dual-tower dispatch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .. import cache
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


def get_query_embeddings(query: str, engine=None) -> Dict[str, np.ndarray]:
    """Dual query embedding with TTL cache + cross-request coalescing
    (reference ``_get_embeddings``, ``retrieve.py:120-129``).

    Returns ``{"text": (384,), "image": (512,)}``. Cache keys are normalized
    (lowercase, collapsed whitespace — ``app/cache/__init__.py:30-31``), so
    trivial query variants share one entry; misses go through the engine's
    :class:`QueryEmbedBatcher` when enabled (one padded dual-tower dispatch
    for every concurrent request in the window), else two direct bucketed
    dispatches.
    """

    cached = cache.get_query_embeddings(query)
    if cached is not None:
        return cached
    if engine is None:
        from .engine import get_engine

        engine = get_engine()
    batcher = engine.query_batcher
    if batcher is not None:
        embeds = batcher.embed(query)
    else:
        embeds = {
            "text": engine.runtime.embed_text_batch([query])[0],
            "image": engine.runtime.embed_query_for_images(query),
        }
    cache.set_query_embeddings(query, embeds)
    return embeds
