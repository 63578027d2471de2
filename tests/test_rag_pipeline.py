"""RAG pipeline end-to-end on tiny engines: index build -> retrieve -> generate.

The live-path analogue of the reference's test_index_build / test_retrieve /
test_generate, but with real (tiny) jitted encoders instead of monkeypatched
fakes — the production code path runs unmodified.
"""

import numpy as np
import pytest
from PIL import Image

from mmrag_tpu.rag import generate as gen
from mmrag_tpu.rag import index_build as ib
from mmrag_tpu.rag import retrieve as rv
from mmrag_tpu.storage import Document

from tiny import tiny_engine


@pytest.fixture()
def engine(tmp_path):
    eng = tiny_engine(tmp_path)
    eng.metadata.upsert_document(
        Document(document_id="doc1", user_id="u1", doc_type="pdf", title="Bio notes")
    )
    yield eng
    eng.close()


def _text_nodes():
    return [
        {
            "id": f"doc1-c{i}",
            "text": text,
            "metadata": {"document_id": "doc1", "page": i + 1},
        }
        for i, text in enumerate(
            [
                "The mitochondria is the powerhouse of the cell.",
                "Photosynthesis converts light energy into chemical energy in plants.",
                "Newton's laws of motion describe classical mechanics.",
            ]
        )
    ]


def test_index_text_nodes_writes_rows_and_bumps_version(engine):
    assert ib.get_index_version("u1", engine) == 0
    written = ib.index_text_nodes("u1", _text_nodes(), engine)
    assert written == 3
    assert len(engine.text_index) == 3
    assert ib.get_index_version("u1", engine) == 1
    # chunks recorded for hydration
    assert engine.metadata.get_chunk("doc1-c0").page == 1
    # idempotent upsert: same ids replace, version bumps again
    ib.index_text_nodes("u1", _text_nodes(), engine)
    assert len(engine.text_index) == 3
    assert ib.get_index_version("u1", engine) == 2


def test_index_text_nodes_resplits_long_text(engine):
    long_text = ". ".join(f"Sentence {i} about many topics" for i in range(400))
    written = ib.index_text_nodes(
        "u1", [{"id": "doc1-long", "text": long_text, "metadata": {"document_id": "doc1"}}],
        engine,
    )
    assert written > 1  # sentence splitter produced sub-chunks
    assert engine.metadata.get_chunk("doc1-long#0") is not None


def test_index_empty_nodes(engine):
    assert ib.index_text_nodes("u1", [], engine) == 0
    assert ib.index_text_nodes("u1", [{"id": "x", "text": "  "}], engine) == 0
    assert ib.get_index_version("u1", engine) == 0


def test_index_image_nodes(engine, tmp_path, rng):
    paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    nodes = [
        {"id": f"doc1-img{i}", "image_path": p, "metadata": {"document_id": "doc1"}}
        for i, p in enumerate(paths)
    ]
    assert ib.index_image_nodes("u1", nodes, engine) == 2
    assert len(engine.image_index) == 2


def test_retrieve_end_to_end(engine):
    ib.index_text_nodes("u1", _text_nodes(), engine)
    out = rv.retrieve("u1", "powerhouse of the cell", engine)
    assert out["index_version"] == 1
    assert len(out["results"]) <= engine.cfg.retrieval.final_n
    assert len(out["text"]) == 3
    # with real tiny encoders + shared hash tokenizer, the overlapping-token
    # chunk should win on cosine
    assert out["text"][0]["chunk_id"] == "doc1-c0" or out["results"]
    # rerank populated on the head
    assert any(h["rerank_score"] is not None for h in out["text"])
    # combined scores populated on fused results
    assert all(h["combined_score"] is not None for h in out["results"])


def test_retrieve_cache_and_version_invalidation(engine, monkeypatch):
    ib.index_text_nodes("u1", _text_nodes(), engine)
    first = rv.retrieve("u1", "cell energy", engine)
    calls = []
    monkeypatch.setattr(
        rv, "retrieve_text", lambda *a, **k: calls.append(1) or []
    )
    again = rv.retrieve("u1", "cell  ENERGY ", engine)  # normalized -> cache hit
    assert again is first and not calls
    ib.index_text_nodes("u1", _text_nodes(), engine)  # version bump
    rv.retrieve("u1", "cell energy", engine)
    assert calls  # cache invalidated, pipeline re-ran


def test_retrieve_document_filter(engine):
    ib.index_text_nodes("u1", _text_nodes(), engine)
    ib.index_text_nodes(
        "u1",
        [{"id": "doc2-c0", "text": "The cell powerhouse mitochondria again",
          "metadata": {"document_id": "doc2"}}],
        engine,
    )
    out = rv.retrieve("u1", "mitochondria powerhouse", engine, document_id="doc2")
    assert out["text"] and all(h["document_id"] == "doc2" for h in out["text"])


def test_retrieve_unknown_user(engine):
    out = rv.retrieve("ghost", "anything", engine)
    assert out["results"] == [] and out["text"] == []


def test_generate_abstains_below_tau():
    results = [
        {"chunk_id": "c", "document_id": "d", "modality": "text", "score": 0.1,
         "combined_score": 0.1, "text": "weak evidence", "meta": {"page": 2}},
    ]
    out = gen.generate_response("q", results)
    assert out["abstained"] is True
    assert out["snippets"][0]["token"] == "[doc:d p:2]"


def test_generate_empty_results():
    out = gen.generate_response("q", [])
    assert out["abstained"] is True and out["citation_tokens"] == []
    assert out["citations"] == {"text": [], "images": []}


def test_generate_answers_above_tau_offline():
    results = [
        {"chunk_id": "c", "document_id": "d", "modality": "text", "score": 0.9,
         "combined_score": 0.9, "text": "strong evidence here",
         "meta": {"ts_start": 10.0, "ts_end": 25.0}},
    ]
    out = gen.generate_response("q", results)
    assert out["abstained"] is False
    assert "[ts:10-25]" in out["answer"]
    assert out["response"] == out["answer"]  # reference payload key
    assert out["citation_tokens"][0]["token"] == "[ts:10-25]"
    assert out["citations"]["text"][0]["document_id"] == "d"


def test_prompt_contains_citations_and_images():
    results = [
        {"chunk_id": "t", "document_id": "d", "modality": "text", "score": 0.9,
         "text": "evidence", "meta": {"page": 3}},
        {"chunk_id": "i", "document_id": "d", "modality": "image", "score": 0.8,
         "media_path": "/tmp/x.png", "meta": {}},
    ]
    prompt = gen.build_prompt("why?", results)
    assert "[doc:d p:3] evidence" in prompt
    assert "/tmp/x.png" in prompt
    assert "Question: why?" in prompt


def test_retrieve_batch_matches_sequential(tmp_path):
    from mmrag_tpu.rag.retrieve import retrieve, retrieve_batch

    eng = tiny_engine(tmp_path, extra_env={"TPU_MICROBATCH_WINDOW_MS": "0"})
    try:
        for user in ("u1", "u2"):
            eng.metadata.upsert_document(
                Document(document_id=f"doc-{user}", user_id=user, doc_type="pdf",
                         title=user)
            )
            nodes = [
                {
                    "id": f"doc-{user}-c{i}",
                    "text": t,
                    "metadata": {"document_id": f"doc-{user}", "page": i + 1},
                }
                for i, t in enumerate(
                    ["alpha particle physics", "beta decay chains", "gamma rays"]
                )
            ]
            ib.index_text_nodes(user, nodes, eng)
        items = [("u1", "alpha physics", None), ("u2", "gamma rays", None),
                 ("u1", "beta decay", "doc-u1")]
        batched = retrieve_batch(items, eng)
        from mmrag_tpu.cache import clear_all_caches

        clear_all_caches()
        sequential = [retrieve(u, q, eng, d) for u, q, d in items]
        for b, s in zip(batched, sequential):
            assert [r["chunk_id"] for r in b["results"]] == [
                r["chunk_id"] for r in s["results"]
            ]
            for rb, rs in zip(b["results"], s["results"]):
                assert abs(rb["score"] - rs["score"]) < 1e-5
                if rs.get("rerank_score") is not None:
                    assert abs(rb["rerank_score"] - rs["rerank_score"]) < 1e-4
        # tenant isolation inside the batch
        assert all(r["user_id"] == "u1" for r in batched[0]["results"])
        assert all(r["user_id"] == "u2" for r in batched[1]["results"])
        assert all(r["document_id"] == "doc-u1" for r in batched[2]["results"])
    finally:
        eng.close()


def test_retrieve_routes_through_batcher(tmp_path):
    from mmrag_tpu.rag.retrieve import retrieve

    eng = tiny_engine(tmp_path, extra_env={"TPU_MICROBATCH_WINDOW_MS": "10"})
    try:
        eng.metadata.upsert_document(
            Document(document_id="d", user_id="u", doc_type="pdf", title="t")
        )
        ib.index_text_nodes(
            "u",
            [{"id": "d-c0", "text": "solar panels convert sunlight",
              "metadata": {"document_id": "d"}}],
            eng,
        )
        import threading

        results = {}
        threads = [
            threading.Thread(
                target=lambda q=f"sunlight {i}": results.update({q: retrieve("u", q, eng)})
            )
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert all(r["results"] for r in results.values())
        assert eng.retrieval_batcher.batches_run < 4  # coalescing happened
    finally:
        eng.close()
