"""Core data records shared across ingest, index, and retrieval.

Mirrors the reference's ``Document``/``Chunk`` pydantic models
(``/root/reference/app/storage/schema.py:12-52``) and ``VectorRow``
(``app/storage/lancedb_store.py:12-21``) as plain frozen dataclasses with
explicit validation — no pydantic dependency on the hot path.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence

import numpy as np

VALID_MODALITIES = ("text", "image")
VALID_DOC_TYPES = ("pdf", "youtube")
VALID_STATUSES = ("pending", "processing", "ready", "failed")


def new_id() -> str:
    return uuid.uuid4().hex


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


@dataclass(frozen=True)
class Document:
    """A user-owned source document (PDF or YouTube video)."""

    document_id: str
    user_id: str
    doc_type: str  # pdf | youtube
    title: str = ""
    source: str = ""  # file path or video URL
    status: str = "pending"
    created_at: float = field(default_factory=time.time)
    meta: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        _require(bool(self.document_id), "document_id is required")
        _require(bool(self.user_id), "user_id is required")
        _require(self.doc_type in VALID_DOC_TYPES, f"doc_type must be one of {VALID_DOC_TYPES}")
        _require(self.status in VALID_STATUSES, f"status must be one of {VALID_STATUSES}")


@dataclass(frozen=True)
class Chunk:
    """An indexed unit: a text span or an image/frame."""

    chunk_id: str
    document_id: str
    user_id: str
    modality: str  # text | image
    text: str = ""
    media_path: str = ""
    page: Optional[int] = None
    ts_start: Optional[float] = None
    ts_end: Optional[float] = None
    meta: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        _require(bool(self.chunk_id), "chunk_id is required")
        _require(bool(self.document_id), "document_id is required")
        _require(bool(self.user_id), "user_id is required")
        _require(self.modality in VALID_MODALITIES, f"modality must be one of {VALID_MODALITIES}")
        if self.modality == "text":
            _require(bool(self.text), "text chunks require text")
        else:
            _require(bool(self.media_path), "image chunks require media_path")

    def metadata_json(self) -> str:
        payload = dict(self.meta)
        payload.update(
            {
                "document_id": self.document_id,
                "modality": self.modality,
                "page": self.page,
                "ts_start": self.ts_start,
                "ts_end": self.ts_end,
                "media_path": self.media_path,
            }
        )
        return json.dumps(payload, sort_keys=True)


@dataclass(frozen=True)
class VectorRow:
    """One embedding row destined for a vector shard."""

    chunk_id: str
    user_id: str
    document_id: str
    modality: str
    embedding: np.ndarray
    meta: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        _require(self.modality in VALID_MODALITIES, f"modality must be one of {VALID_MODALITIES}")
        emb = np.asarray(self.embedding, dtype=np.float32)
        _require(emb.ndim == 1 and emb.size > 0, "embedding must be a non-empty 1-D vector")
        object.__setattr__(self, "embedding", emb)


@dataclass(frozen=True)
class RetrievedHit:
    """A scored retrieval hit after hydration (reference result dict shape)."""

    chunk_id: str
    document_id: str
    user_id: str
    modality: str
    score: float
    rerank_score: Optional[float] = None
    combined_score: Optional[float] = None
    text: str = ""
    media_path: str = ""
    meta: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "chunk_id": self.chunk_id,
            "document_id": self.document_id,
            "user_id": self.user_id,
            "modality": self.modality,
            "score": self.score,
            "rerank_score": self.rerank_score,
            "combined_score": self.combined_score,
            "text": self.text,
            "media_path": self.media_path,
            "meta": dict(self.meta),
        }


def rows_to_matrix(rows: Sequence[VectorRow], dim: int) -> np.ndarray:
    """Stack row embeddings into a (n, dim) f32 matrix, validating dims."""

    if not rows:
        return np.zeros((0, dim), dtype=np.float32)
    mat = np.stack([r.embedding for r in rows]).astype(np.float32)
    if mat.shape[1] != dim:
        raise ValueError(f"embedding dim mismatch: expected {dim}, got {mat.shape[1]}")
    return mat
