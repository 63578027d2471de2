"""Z-score fusion of text cosine, text rerank, and image cosine scores.

Exact reimplementation of the reference's fusion math
(``/root/reference/app/ml/retrieve.py:158-195``): each score list is
z-normalized independently (zero std -> zeros); a text hit's combined score is
the mean of its available z-scores (cosine, and rerank when present); an image
hit's combined score is its cosine z-score; the merged list is sorted by
combined score descending and truncated to ``final_n``.

Operates on tiny host-side lists (<= topk_text + topk_image ~= 62 entries), so
this is NumPy, not a device kernel — dispatching to TPU here would cost more
in transfer than it saves in compute.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..storage.records import RetrievedHit


def z_scores(values: Sequence[float]) -> np.ndarray:
    """Per-list z-normalization; degenerate lists (n<2 or zero std) -> zeros."""

    arr = np.asarray(values, dtype=np.float64)
    if arr.size < 2:
        return np.zeros_like(arr)
    std = arr.std()
    if std < 1e-12:
        return np.zeros_like(arr)
    return (arr - arr.mean()) / std


def fuse_results(
    text_hits: Sequence[RetrievedHit],
    image_hits: Sequence[RetrievedHit],
    final_n: int,
) -> List[RetrievedHit]:
    """Fuse modality lists into the final context set."""

    text_cos_z = z_scores([h.score for h in text_hits])
    reranked = [h for h in text_hits if h.rerank_score is not None]
    rerank_z_map = {}
    if reranked:
        rz = z_scores([h.rerank_score for h in reranked])
        rerank_z_map = {h.chunk_id: z for h, z in zip(reranked, rz)}
    image_cos_z = z_scores([h.score for h in image_hits])

    fused: List[RetrievedHit] = []
    for h, cz in zip(text_hits, text_cos_z):
        parts = [cz]
        if h.chunk_id in rerank_z_map:
            parts.append(rerank_z_map[h.chunk_id])
        combined = float(np.mean(parts))
        fused.append(_with_combined(h, combined))
    for h, cz in zip(image_hits, image_cos_z):
        fused.append(_with_combined(h, float(cz)))

    fused.sort(key=lambda h: h.combined_score, reverse=True)
    return fused[: max(final_n, 0)]


def _with_combined(hit: RetrievedHit, combined: float) -> RetrievedHit:
    return RetrievedHit(
        chunk_id=hit.chunk_id,
        document_id=hit.document_id,
        user_id=hit.user_id,
        modality=hit.modality,
        score=hit.score,
        rerank_score=hit.rerank_score,
        combined_score=combined,
        text=hit.text,
        media_path=hit.media_path,
        meta=hit.meta,
    )
