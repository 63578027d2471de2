"""Streaming decode->embed->index pipeline: overlap semantics + contract."""

import numpy as np
import pytest

from mmrag_tpu.rag.stream import stream_index_images, stream_index_video_frames


class _FakeRuntime:
    """Yields per-bucket 'device' arrays; records when each bucket is forced
    (np.asarray) relative to when the next bucket was produced."""

    clip_dim = 8

    def __init__(self, bucket: int = 4):
        self.bucket = bucket
        self.events = []

    def embed_images_async(self, images):
        runtime = self

        class _Lazy:
            def __init__(self, idx, n):
                self.idx, self.n = idx, n

            def __getitem__(self, sl):
                return self

            def __array__(self, dtype=None, copy=None):
                runtime.events.append(("force", self.idx))
                return np.full((self.n, runtime.clip_dim), self.idx + 1.0, np.float32)

        for b, start in enumerate(range(0, len(images), self.bucket)):
            n = min(self.bucket, len(images) - start)
            self.events.append(("produce", b))
            yield _Lazy(b, n), n


class _FakeIndex:
    def __init__(self):
        self.rows = []

    def upsert(self, rows):
        self.rows.extend(rows)
        return len(rows)


class _FakeMeta:
    def __init__(self):
        self.chunks = []
        self.docs = []

    def upsert_chunks(self, chunks):
        self.chunks.extend(chunks)

    def ensure_document(self, doc_id, user_id):
        self.docs.append((doc_id, user_id))


class _FakeVersions:
    def __init__(self):
        self.bumps = []

    def bump(self, user):
        self.bumps.append(user)


class _FakeEngine:
    def __init__(self, bucket=4):
        self.runtime = _FakeRuntime(bucket)
        self.image_index = _FakeIndex()
        self.metadata = _FakeMeta()
        self.versions = _FakeVersions()


def _items(n):
    return [
        (
            {
                "id": f"c{i}",
                "metadata": {"document_id": "doc1", "media_path": f"/m/{i}.jpg"},
            },
            np.zeros((8, 8, 3), np.uint8),
        )
        for i in range(n)
    ]


def test_stream_indexes_all_rows_and_bumps_version():
    eng = _FakeEngine(bucket=4)
    written = stream_index_images("u1", _items(10), eng)
    assert written == 10
    assert [r.chunk_id for r in eng.image_index.rows] == [f"c{i}" for i in range(10)]
    assert len(eng.metadata.chunks) == 10
    assert eng.versions.bumps == ["u1"]
    # bucket 0's embeddings land on rows 0-3, bucket 2's on rows 8-9
    assert eng.image_index.rows[0].embedding[0] == 1.0
    assert eng.image_index.rows[9].embedding[0] == 3.0


def test_stream_overlaps_buckets():
    """Bucket N is only forced AFTER bucket N+1 is produced (dispatch overlap)."""

    eng = _FakeEngine(bucket=4)
    stream_index_images("u1", _items(12), eng)
    ev = eng.runtime.events
    assert ev.index(("produce", 1)) < ev.index(("force", 0))
    assert ev.index(("produce", 2)) < ev.index(("force", 1))


def test_stream_empty_is_noop():
    eng = _FakeEngine()
    assert stream_index_images("u1", [], eng) == 0
    assert eng.versions.bumps == []


def test_video_frame_adapter_builds_nodes():
    from mmrag_tpu.ingest.frames import ExtractedFrame

    eng = _FakeEngine(bucket=8)
    frames = [ExtractedFrame(path=f"/f/{i}.jpg", ts=float(i * 5)) for i in range(3)]
    arrays = [np.zeros((4, 4, 3), np.uint8)] * 3
    written = stream_index_video_frames("u1", "docv", frames, arrays, eng)
    assert written == 3
    chunk = eng.metadata.chunks[1]
    assert chunk.modality == "image"
    assert chunk.media_path == "/f/1.jpg"
    assert chunk.ts_start == 5.0
    assert eng.image_index.rows[0].chunk_id == "docv-frame-0000"


def test_stream_registers_documents_before_chunks(tmp_path, rng):
    """Regression: chunks have an FK on documents (PRAGMA foreign_keys=ON);
    streaming must register the document and write the catalog BEFORE the
    vector rows, so a catalog failure can't leave orphaned vectors."""

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from tiny import tiny_engine

    eng = tiny_engine(tmp_path)
    try:
        items = [
            (
                {
                    "id": "img-0",
                    "metadata": {"document_id": "never-registered",
                                 "media_path": "/m/0.jpg"},
                },
                np.zeros((8, 8, 3), np.uint8),
            )
        ]
        written = stream_index_images("u1", items, eng)
        assert written == 1
        chunk = eng.metadata.get_chunk("img-0")
        assert chunk is not None and chunk.document_id == "never-registered"
    finally:
        eng.close()


def test_stream_catalog_failure_leaves_no_orphan_vectors(rng):
    eng = _FakeEngine(bucket=4)

    def boom(chunks):
        raise RuntimeError("catalog down")

    eng.metadata.upsert_chunks = boom
    eng.metadata.ensure_document = lambda *a, **k: None
    with pytest.raises(RuntimeError, match="catalog down"):
        stream_index_images("u1", _items(3), eng)
    assert eng.image_index.rows == []  # vectors were NOT written first
