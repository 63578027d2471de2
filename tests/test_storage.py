"""Metadata/Note/Version stores: CRUD round-trips, cascade, batched hydration,
atomic version bumps under threads (the reference's race list, SURVEY §5)."""

import threading

import numpy as np
import pytest

from mmrag_tpu.index.version import IndexVersionStore
from mmrag_tpu.storage import Chunk, Document, MetadataStore, NoteStore, VectorRow


@pytest.fixture()
def store(tmp_path):
    s = MetadataStore(str(tmp_path / "meta.db"))
    yield s
    s.close()


def _doc(doc_id="d1", user="u1", status="pending"):
    return Document(document_id=doc_id, user_id=user, doc_type="pdf", title="t", status=status)


def test_document_roundtrip_and_upsert(store):
    store.upsert_document(_doc())
    got = store.get_document("d1")
    assert got.title == "t" and got.status == "pending"
    store.upsert_document(_doc(status="ready"))
    assert store.get_document("d1").status == "ready"
    assert [d.document_id for d in store.list_documents("u1")] == ["d1"]
    assert store.list_documents("nobody") == []


def test_chunk_crud_cascade_and_batch(store):
    store.upsert_document(_doc())
    chunks = [
        Chunk(chunk_id=f"c{i}", document_id="d1", user_id="u1", modality="text", text=f"x{i}")
        for i in range(5)
    ]
    store.upsert_chunks(chunks)
    assert store.get_chunk("c3").text == "x3"
    batch = store.get_chunks_batch(["c0", "c4", "missing"])
    assert set(batch) == {"c0", "c4"}
    meta = store.get_metadata("u1")
    assert meta["documents"] == 1 and meta["chunks"] == 5
    store.delete_document("d1")
    assert store.get_chunk("c0") is None  # FK cascade


def test_chunk_validation():
    with pytest.raises(ValueError):
        Chunk(chunk_id="c", document_id="d", user_id="u", modality="text", text="")
    with pytest.raises(ValueError):
        Chunk(chunk_id="c", document_id="d", user_id="u", modality="image", media_path="")
    with pytest.raises(ValueError):
        Document(document_id="d", user_id="u", doc_type="webpage")


def test_vector_row_coerces_f32():
    row = VectorRow(
        chunk_id="c", user_id="u", document_id="d", modality="text",
        embedding=np.ones(4, dtype=np.float64),
    )
    assert row.embedding.dtype == np.float32


def test_note_store_roundtrip(tmp_path):
    ns = NoteStore(str(tmp_path / "notes.db"))
    payload = {"summary": "s", "key_points": ["a"], "timeline": [], "quiz": [{"q": "?"}]}
    ns.upsert("u1", "v1", payload, title="Video 1")
    videos = ns.list_videos("u1")
    assert videos[0]["video_id"] == "v1" and videos[0]["title"] == "Video 1"
    got = ns.get_video("u1", "v1")
    assert got["summary"] == "s" and got["video_id"] == "v1"
    assert ns.get_quiz("u1", "v1") == [{"q": "?"}]
    assert ns.get_video("u2", "v1") is None
    assert ns.get_quiz("u2", "v1") is None
    ns.close()


def test_version_store_atomic_bumps(tmp_path):
    vs = IndexVersionStore(str(tmp_path / "versions.db"))
    assert vs.get("u1") == 0
    threads = [threading.Thread(target=lambda: [vs.bump("u1") for _ in range(20)]) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert vs.get("u1") == 160
    assert vs.get("u2") == 0
    vs.close()
