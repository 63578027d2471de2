"""SQLite metadata catalog: documents + chunks.

Same contract as the reference ``MetadataStore``
(``/root/reference/app/storage/schema.py:68-246``) — upsert-on-conflict CRUD,
FK cascade from documents to chunks, aggregate ``get_metadata`` — with the
reference's known races fixed: the shared ``check_same_thread=False``
connection is guarded by an ``RLock``, WAL mode is enabled, and hydration is
batched (``get_chunks_batch``) instead of the reference's per-hit N+1 loop
(``app/ml/retrieve.py:55-67``).
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
import time
from typing import Dict, Iterable, List, Optional, Sequence

from .records import Chunk, Document

_DOC_COLUMNS = "document_id, user_id, doc_type, title, source, status, created_at, meta"
_CHUNK_COLUMNS = (
    "chunk_id, document_id, user_id, modality, text, media_path, page, ts_start, ts_end, meta"
)


class MetadataStore:
    """Thread-safe document/chunk catalog backed by a single SQLite file."""

    def __init__(self, db_path: str) -> None:
        self._db_path = db_path
        directory = os.path.dirname(os.path.abspath(db_path))
        os.makedirs(directory, exist_ok=True)
        self._lock = threading.RLock()
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._conn.execute("PRAGMA journal_mode=WAL")
        self._conn.execute("PRAGMA foreign_keys=ON")
        self._create_tables()

    def _create_tables(self) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                """
                CREATE TABLE IF NOT EXISTS documents (
                    document_id TEXT PRIMARY KEY,
                    user_id TEXT NOT NULL,
                    doc_type TEXT NOT NULL,
                    title TEXT NOT NULL DEFAULT '',
                    source TEXT NOT NULL DEFAULT '',
                    status TEXT NOT NULL DEFAULT 'pending',
                    created_at REAL NOT NULL,
                    meta TEXT NOT NULL DEFAULT '{}'
                )
                """
            )
            self._conn.execute(
                """
                CREATE TABLE IF NOT EXISTS chunks (
                    chunk_id TEXT PRIMARY KEY,
                    document_id TEXT NOT NULL
                        REFERENCES documents(document_id) ON DELETE CASCADE,
                    user_id TEXT NOT NULL,
                    modality TEXT NOT NULL,
                    text TEXT NOT NULL DEFAULT '',
                    media_path TEXT NOT NULL DEFAULT '',
                    page INTEGER,
                    ts_start REAL,
                    ts_end REAL,
                    meta TEXT NOT NULL DEFAULT '{}'
                )
                """
            )
            self._conn.execute(
                "CREATE INDEX IF NOT EXISTS idx_chunks_doc ON chunks(document_id)"
            )
            self._conn.execute(
                "CREATE INDEX IF NOT EXISTS idx_docs_user ON documents(user_id)"
            )

    # -- documents ----------------------------------------------------------

    def upsert_document(self, doc: Document) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                f"""
                INSERT INTO documents ({_DOC_COLUMNS})
                VALUES (?, ?, ?, ?, ?, ?, ?, ?)
                ON CONFLICT(document_id) DO UPDATE SET
                    user_id=excluded.user_id,
                    doc_type=excluded.doc_type,
                    title=excluded.title,
                    source=excluded.source,
                    status=excluded.status,
                    meta=excluded.meta
                """,
                (
                    doc.document_id,
                    doc.user_id,
                    doc.doc_type,
                    doc.title,
                    doc.source,
                    doc.status,
                    doc.created_at,
                    json.dumps(doc.meta, sort_keys=True),
                ),
            )

    def ensure_document(
        self, document_id: str, user_id: str, doc_type: str = "pdf"
    ) -> None:
        """Insert a stub document iff absent (keeps chunk FK satisfiable when
        indexing runs before the caller registered the document)."""

        with self._lock, self._conn:
            self._conn.execute(
                f"""
                INSERT INTO documents ({_DOC_COLUMNS})
                VALUES (?, ?, ?, '', '', 'processing', ?, '{{}}')
                ON CONFLICT(document_id) DO NOTHING
                """,
                (document_id, user_id, doc_type, time.time()),
            )

    def set_document_status(self, document_id: str, status: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "UPDATE documents SET status=? WHERE document_id=?", (status, document_id)
            )

    def get_document(self, document_id: str) -> Optional[Document]:
        with self._lock:
            row = self._conn.execute(
                f"SELECT {_DOC_COLUMNS} FROM documents WHERE document_id=?", (document_id,)
            ).fetchone()
        return _row_to_document(row) if row else None

    def list_documents(
        self, user_id: str, doc_type: Optional[str] = None
    ) -> List[Document]:
        query = f"SELECT {_DOC_COLUMNS} FROM documents WHERE user_id=?"
        params: List[object] = [user_id]
        if doc_type:
            query += " AND doc_type=?"
            params.append(doc_type)
        query += " ORDER BY created_at DESC"
        with self._lock:
            rows = self._conn.execute(query, params).fetchall()
        return [_row_to_document(r) for r in rows]

    def delete_document(self, document_id: str) -> None:
        with self._lock, self._conn:
            self._conn.execute("DELETE FROM documents WHERE document_id=?", (document_id,))

    # -- chunks -------------------------------------------------------------

    def upsert_chunks(self, chunks: Sequence[Chunk]) -> None:
        if not chunks:
            return
        payload = [
            (
                c.chunk_id,
                c.document_id,
                c.user_id,
                c.modality,
                c.text,
                c.media_path,
                c.page,
                c.ts_start,
                c.ts_end,
                json.dumps(c.meta, sort_keys=True),
            )
            for c in chunks
        ]
        with self._lock, self._conn:
            self._conn.executemany(
                f"""
                INSERT INTO chunks ({_CHUNK_COLUMNS})
                VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)
                ON CONFLICT(chunk_id) DO UPDATE SET
                    document_id=excluded.document_id,
                    user_id=excluded.user_id,
                    modality=excluded.modality,
                    text=excluded.text,
                    media_path=excluded.media_path,
                    page=excluded.page,
                    ts_start=excluded.ts_start,
                    ts_end=excluded.ts_end,
                    meta=excluded.meta
                """,
                payload,
            )

    def get_chunk(self, chunk_id: str) -> Optional[Chunk]:
        with self._lock:
            row = self._conn.execute(
                f"SELECT {_CHUNK_COLUMNS} FROM chunks WHERE chunk_id=?", (chunk_id,)
            ).fetchone()
        return _row_to_chunk(row) if row else None

    def get_chunks_batch(self, chunk_ids: Iterable[str]) -> Dict[str, Chunk]:
        """Batched hydration: one query for all ids (fixes reference N+1)."""

        ids = [c for c in chunk_ids]
        if not ids:
            return {}
        out: Dict[str, Chunk] = {}
        # SQLite caps bound params (default 999); chunk the IN list.
        with self._lock:
            for start in range(0, len(ids), 500):
                batch = ids[start : start + 500]
                placeholders = ",".join("?" * len(batch))
                rows = self._conn.execute(
                    f"SELECT {_CHUNK_COLUMNS} FROM chunks WHERE chunk_id IN ({placeholders})",
                    batch,
                ).fetchall()
                for r in rows:
                    chunk = _row_to_chunk(r)
                    out[chunk.chunk_id] = chunk
        return out

    def list_chunks(self, document_id: str) -> List[Chunk]:
        with self._lock:
            rows = self._conn.execute(
                f"SELECT {_CHUNK_COLUMNS} FROM chunks WHERE document_id=?", (document_id,)
            ).fetchall()
        return [_row_to_chunk(r) for r in rows]

    def get_metadata(self, user_id: str) -> Dict[str, object]:
        """Aggregate stats (reference ``schema.py:241-246``)."""

        with self._lock:
            docs = self._conn.execute(
                "SELECT COUNT(*) FROM documents WHERE user_id=?", (user_id,)
            ).fetchone()[0]
            chunks = self._conn.execute(
                "SELECT COUNT(*) FROM chunks WHERE user_id=?", (user_id,)
            ).fetchone()[0]
        return {"user_id": user_id, "documents": docs, "chunks": chunks}

    def close(self) -> None:
        with self._lock:
            self._conn.close()


def _row_to_document(row: sqlite3.Row) -> Document:
    return Document(
        document_id=row[0],
        user_id=row[1],
        doc_type=row[2],
        title=row[3],
        source=row[4],
        status=row[5],
        created_at=row[6],
        meta=json.loads(row[7] or "{}"),
    )


def _row_to_chunk(row: sqlite3.Row) -> Chunk:
    return Chunk(
        chunk_id=row[0],
        document_id=row[1],
        user_id=row[2],
        modality=row[3],
        text=row[4],
        media_path=row[5],
        page=row[6],
        ts_start=row[7],
        ts_end=row[8],
        meta=json.loads(row[9] or "{}"),
    )
