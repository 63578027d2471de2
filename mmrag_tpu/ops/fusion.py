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
    """Fuse modality lists into the final context set.

    Faithful to a reference quirk (``retrieve.py:163-180``): the rerank
    z-list is built from the reranked items *in resorted list order* but
    attached back by LIST POSITION (``idx < len(text_rerank_z)``), not by
    item identity. When every reranked item occupies the head of the
    resorted list (the common case) this equals per-item matching; when a
    non-reranked hit outsorts a reranked one, the reference assigns the
    positional z anyway — and so do we, because the behavioral contract
    (identical final-4 ordering, test_e2e_reference_parity) beats
    tidiness here."""

    text_cos_z = z_scores([h.score for h in text_hits])
    rerank_vals = [h.rerank_score for h in text_hits if h.rerank_score is not None]
    rerank_z = z_scores(rerank_vals) if rerank_vals else np.zeros(0)
    image_cos_z = z_scores([h.score for h in image_hits])

    fused: List[RetrievedHit] = []
    for idx, (h, cz) in enumerate(zip(text_hits, text_cos_z)):
        parts = [cz]
        if idx < len(rerank_z):
            parts.append(float(rerank_z[idx]))
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
