"""Whole-pipeline behavioral parity vs the COMPOSED reference retriever.

Per-model numerics are proven in test_model_parity; this harness proves the
*composed* retrieve -> rerank -> z-fuse pipeline end-to-end (VERDICT r1
item 4): the reference's math (``/root/reference/app/ml/retrieve.py:132-195``
— cosine recall top-k, cross-encoder rerank of the top ``rerank_topk`` then a
full resort on ``rerank_score or score``, per-list z-normalization, text
combined = mean of available z's, image = z, merged sort, truncate to
``final_n``) is re-expressed here in torch/numpy from the formulas, fed the
SAME converted random-init weights and the SAME corpus (the reference repo's
bundled ``temp_Integrated1.pdf``), and must produce the identical final-4
chunk ids in the identical order as ``mmrag_tpu.rag.retrieve``.

Both stacks share the WordPiece tokenizer (tokenizer-vs-HF parity is proven
separately in test_tokenizer), so any divergence here is pipeline math or
encoder numerics — exactly what the harness is for.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from mmrag_tpu.models import bert as jbert
from mmrag_tpu.models import clip as jclip
from mmrag_tpu.models import convert

REFERENCE_PDF = "/root/reference/temp_Integrated1.pdf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_PDF), reason="reference PDF not mounted"
)

# compact CLIP geometry shared by both stacks (full-size towers are
# numerically covered in test_model_parity; here the subject is composition)
_CLIP_J = jclip.CLIPConfig(
    vision=jclip.CLIPVisionConfig(
        image_size=64, patch_size=32, hidden_size=64, num_layers=2,
        num_heads=4, intermediate_size=128,
    ),
    text=jclip.CLIPTextConfig(
        vocab_size=49408, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=77,
    ),
    projection_dim=64,
)


def _state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _build_vocab(texts):
    """Deterministic WordPiece vocab from the corpus itself (zero egress)."""

    words = set()
    for t in texts:
        for w in t.lower().split():
            words.add("".join(c for c in w if c.isalnum()))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += sorted(w for w in words if w)[:20000]
    return vocab


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    """Both pipelines over identical weights + the bundled reference PDF."""

    td = tmp_path_factory.mktemp("e2e")
    torch.manual_seed(7)

    # --- shared random-init torch models + converted JAX params ---
    bert_cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=384, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=1536,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    minilm_t = transformers.BertModel(bert_cfg).eval()
    cross_cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=384, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=1536, num_labels=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cross_t = transformers.BertForSequenceClassification(cross_cfg).eval()
    clip_hf_cfg = transformers.CLIPConfig(
        vision_config=dict(
            image_size=64, patch_size=32, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
        ),
        text_config=dict(
            vocab_size=49408, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=77,
        ),
        projection_dim=64,
    )
    clip_t = transformers.CLIPModel(clip_hf_cfg).eval()

    weights = td / "weights"
    from mmrag_tpu.models.runtime import _sanitize
    from mmrag_tpu.settings import load_settings

    env = {
        "TPU_INDEX_DIR": str(td / "index"),
        "NOTES_DB_PATH": str(td / "notes.db"),
        "WEIGHTS_DIR": str(weights),
        "MEDIA_DIR": str(td / "media"),
        "INGEST_CACHE_DIR": str(td / "cache"),
        "TPU_COMPUTE_DTYPE": "float32",
        "TPU_INDEX_DTYPE": "float32",
        "TPU_MICROBATCH_WINDOW_MS": "0",
        "TPU_DATA_PARALLEL": "off",
        # full-depth rerank: with random-init weights, adjacent raw scores
        # sit ~1e-5 apart, so the reference's POSITIONAL rerank-z attachment
        # (covered exactly by test_positional_rerank_quirk below) would make
        # final-4 parity hinge on which near-tied item lands at position 8.
        # Reranking the whole list removes that platform-drift coin flip
        # while still driving every pipeline stage with real encoders.
        "RERANK_TOPK": "64",
    }
    cfg = load_settings(env)
    for model_id, params in [
        (cfg.models.text, convert.convert_bert(_state_dict(minilm_t), jbert.MINILM_L6)),
        (cfg.models.reranker, convert.convert_cross_encoder(_state_dict(cross_t), jbert.MINILM_L6)),
        (cfg.models.clip, convert.convert_clip(_state_dict(clip_t), _CLIP_J)),
    ]:
        wdir = os.path.join(str(weights), _sanitize(model_id))
        convert.save_params(params, wdir, "model")

    # --- the corpus: the reference repo's bundled PDF ---
    from mmrag_tpu.ingest.pdf import extract_pdf_nodes

    text_nodes, _ = extract_pdf_nodes("u1", "doc1", REFERENCE_PDF, cfg)
    vocab = _build_vocab([n["text"] for n in text_nodes])
    vpath = os.path.join(str(weights), _sanitize(cfg.models.text), "vocab.txt")
    with open(vpath, "w") as fh:
        fh.write("\n".join(vocab))

    # --- our stack: a real engine over the converted weights ---
    from mmrag_tpu.models.runtime import EncoderRuntime
    from mmrag_tpu.rag import index_build as ib
    from mmrag_tpu.rag.engine import RagEngine
    from mmrag_tpu.storage import Document
    from mmrag_tpu.storage.records import VectorRow

    runtime = EncoderRuntime(cfg, clip_cfg=_CLIP_J)
    engine = RagEngine(cfg, runtime)
    engine.metadata.upsert_document(
        Document(document_id="doc1", user_id="u1", doc_type="pdf", title="ref pdf")
    )
    ib.index_text_nodes("u1", text_nodes, engine)

    # image rows: caption texts through each stack's own CLIP text tower
    # (internally consistent per stack, like a real deployment's CLIP space)
    captions = [
        "architecture diagram of the processing pipeline",
        "bar chart of model accuracy results",
        "photo of a warehouse worker lifting a box",
        "flowchart of the retrieval system",
        "screenshot of the web interface",
    ]
    cap_vecs_ours = runtime.embed_queries_for_images(captions)
    from mmrag_tpu.storage.records import Chunk

    image_rows = []
    for i, (cap, vec) in enumerate(zip(captions, cap_vecs_ours)):
        cid = f"img-{i}"
        engine.metadata.upsert_chunks(
            [Chunk(chunk_id=cid, document_id="doc1", user_id="u1",
                   modality="image", text=cap, media_path=f"/tmp/{cid}.png")]
        )
        image_rows.append(
            VectorRow(chunk_id=cid, user_id="u1", document_id="doc1",
                      modality="image", embedding=np.asarray(vec))
        )
    engine.image_index.upsert(image_rows)

    # --- reference stack: torch embeddings of the SAME splitter chunks,
    # embedding the metadata-inclusive text exactly as both index builders do
    # (reference index_build.py:65-69 / ours _metadata_text) while retrieval
    # reranks/hydrates the raw chunk text ---
    from mmrag_tpu.rag.index_build import _metadata_text

    chunk_ids = list(engine.text_index._chunk_to_row.keys())
    chunk_map = engine.metadata.get_chunks_batch(chunk_ids)
    corpus = [(cid, chunk_map[cid].text) for cid in chunk_ids]
    embed_texts = [
        _metadata_text(chunk_map[cid].text, chunk_map[cid].meta) for cid in chunk_ids
    ]

    tok = runtime._bert_tok  # shared tokenizer (parity proven separately)

    def torch_minilm(texts):
        seqs = [[tok.cls_id, *tok.tokenize_ids(t)[:254], tok.sep_id] for t in texts]
        L = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), np.int64)
        mask = np.zeros((len(seqs), L), np.int64)
        for r, s in enumerate(seqs):
            ids[r, : len(s)] = s
            mask[r, : len(s)] = 1
        with torch.no_grad():
            out = minilm_t(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        m = mask[:, :, None].astype(np.float32)
        pooled = (out * m).sum(1) / np.maximum(m.sum(1), 1e-9)
        return pooled / np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-12)

    def torch_cross(query, passages):
        seq = cfg.tpu.rerank_seq_len
        ids, mask, tt = tok.encode_pairs([query] * len(passages), passages, seq)
        with torch.no_grad():
            logits = cross_t(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                token_type_ids=torch.tensor(tt.astype(np.int64)),
            ).logits.numpy()
        return logits[:, 0]

    def torch_clip_text(texts):
        ids, mask = runtime._clip_tok.encode(texts, max_len=77)
        with torch.no_grad():
            feats = clip_t.get_text_features(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).numpy()
        return feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)

    ref = {
        "corpus": corpus,
        "text_mat": torch_minilm(embed_texts),
        "image_ids": [f"img-{i}" for i in range(len(captions))],
        "image_mat": torch_clip_text(captions),
        "minilm": torch_minilm,
        "cross": torch_cross,
        "clip_text": torch_clip_text,
    }
    yield engine, ref, cfg
    engine.close()


def _z(values):
    """Reference _z_scores math (retrieve.py:187-195), re-expressed."""

    numeric = [v for v in values if v is not None]
    if not numeric:
        return []
    arr = np.array(numeric, dtype=np.float32)
    std = float(arr.std())
    if std == 0:
        return [0.0 for _ in values]
    mean = float(arr.mean())
    return [float((v - mean) / std) if v is not None else 0.0 for v in values]


def _reference_pipeline(query, ref, cfg):
    """The reference's composed retrieve flow in torch/numpy, from formulas:
    recall top-k -> rerank top-`rerank_topk` -> resort on rerank||score ->
    per-list z-fusion -> final_n (retrieve.py:41-195)."""

    r = cfg.retrieval
    qv = ref["minilm"]([query])[0]
    scores = ref["text_mat"] @ qv
    order = np.argsort(-scores)[: r.index_topk_text]
    text_results = [
        {"chunk_id": ref["corpus"][i][0], "text": ref["corpus"][i][1],
         "score": float(scores[i])}
        for i in order
    ]
    head = text_results[: r.rerank_topk]
    rr = ref["cross"](query, [h["text"] for h in head])
    for item, s in zip(head, rr):
        item["rerank_score"] = float(s)
    text_results.sort(
        key=lambda it: it.get("rerank_score", it["score"]), reverse=True
    )

    iqv = ref["clip_text"]([query])[0]
    iscores = ref["image_mat"] @ iqv
    iorder = np.argsort(-iscores)[: r.index_topk_image]
    image_results = [
        {"chunk_id": ref["image_ids"][i], "score": float(iscores[i])}
        for i in iorder
    ]

    text_cos_z = _z([it["score"] for it in text_results])
    text_rerank_z = _z([it.get("rerank_score") for it in text_results
                        if "rerank_score" in it])
    image_z = _z([it["score"] for it in image_results])
    items = []
    for idx, it in enumerate(text_results):
        zs = []
        if text_cos_z:
            zs.append(text_cos_z[idx])
        if text_rerank_z and idx < len(text_rerank_z):
            zs.append(text_rerank_z[idx])
        items.append((it["chunk_id"], float(np.mean(zs)) if zs else it["score"]))
    for idx, it in enumerate(image_results):
        items.append((it["chunk_id"], image_z[idx] if image_z else it["score"]))
    items.sort(key=lambda kv: kv[1], reverse=True)
    return items[: r.final_n]


QUERIES = [
    "posture risk assessment using computer vision",
    "what does the architecture diagram show",
    "deep learning model accuracy results",
]


def test_final_four_ids_and_order_match(stacks):
    from mmrag_tpu.rag import retrieve as rv

    engine, ref, cfg = stacks
    for query in QUERIES:
        want = _reference_pipeline(query, ref, cfg)
        got = rv.retrieve("u1", query, engine)
        got_ids = [h["chunk_id"] for h in got["results"]]
        want_ids = [cid for cid, _ in want]
        assert got_ids == want_ids, (
            f"query {query!r}: ours {got_ids} vs reference {want_ids}"
        )


def test_pq_index_preserves_composed_ordering(stacks, tmp_path):
    """Swapping the index layout to pq (m-byte ADC codes + exact host
    refine) leaves the COMPOSED pipeline's final ids and order unchanged
    vs the f32 engine: the refine pass returns true cosines, so the
    rerank and z-fusion stages see the same scores."""

    from mmrag_tpu.cache import clear_all_caches
    from mmrag_tpu.ingest.pdf import extract_pdf_nodes
    from mmrag_tpu.rag import index_build as ib
    from mmrag_tpu.rag import retrieve as rv
    from mmrag_tpu.rag.engine import RagEngine
    from mmrag_tpu.settings import load_settings
    from mmrag_tpu.storage import Document
    from mmrag_tpu.storage.records import Chunk, VectorRow

    engine, ref, cfg = stacks
    env = {
        "TPU_INDEX_DIR": str(tmp_path / "index"),
        "NOTES_DB_PATH": str(tmp_path / "notes.db"),
        "WEIGHTS_DIR": cfg.paths.weights_dir,
        "MEDIA_DIR": str(tmp_path / "media"),
        "INGEST_CACHE_DIR": str(tmp_path / "cache"),
        "TPU_COMPUTE_DTYPE": "float32",
        "TPU_INDEX_DTYPE": "pq",
        "TPU_MICROBATCH_WINDOW_MS": "0",
        "TPU_DATA_PARALLEL": "off",
        "RERANK_TOPK": "64",
    }
    cfg2 = load_settings(env)
    # reuse the fixture's runtime: cfg2 differs only in index-layer knobs
    # (TPU_INDEX_DTYPE, index dir), so a fresh EncoderRuntime would recompile
    # identical towers — ~200 s of pure compile on a CPU backend
    runtime2 = engine.runtime
    pq_engine = RagEngine(cfg2, runtime2)
    assert pq_engine.text_index.is_pq
    pq_engine.metadata.upsert_document(
        Document(document_id="doc1", user_id="u1", doc_type="pdf",
                 title="ref pdf")
    )
    text_nodes, _ = extract_pdf_nodes("u1", "doc1", REFERENCE_PDF, cfg2)
    ib.index_text_nodes("u1", text_nodes, pq_engine)
    captions = [
        "architecture diagram of the processing pipeline",
        "bar chart of model accuracy results",
        "photo of a warehouse worker lifting a box",
        "flowchart of the retrieval system",
        "screenshot of the web interface",
    ]
    cap_vecs = runtime2.embed_queries_for_images(captions)
    image_rows = []
    for i, (cap, vec) in enumerate(zip(captions, cap_vecs)):
        cid = f"img-{i}"
        pq_engine.metadata.upsert_chunks(
            [Chunk(chunk_id=cid, document_id="doc1", user_id="u1",
                   modality="image", text=cap, media_path=f"/tmp/{cid}.png")]
        )
        image_rows.append(
            VectorRow(chunk_id=cid, user_id="u1", document_id="doc1",
                      modality="image", embedding=np.asarray(vec))
        )
    pq_engine.image_index.upsert(image_rows)

    for query in QUERIES:
        base = rv.retrieve("u1", query, engine)
        base_ids = [h["chunk_id"] for h in base["results"]]
        # the retrieval/chat caches are process-global and keyed
        # (user, query, version) — the two engines' version counters can
        # coincide, so clear between the two retrievals
        clear_all_caches()
        got = rv.retrieve("u1", query, pq_engine)
        got_ids = [h["chunk_id"] for h in got["results"]]
        assert got_ids == base_ids, (
            f"query {query!r}: pq {got_ids} vs f32 {base_ids}"
        )
        clear_all_caches()
    pq_engine.close()


def test_combined_scores_track_reference(stacks):
    """Beyond ordering: the fused combined_score values agree numerically.
    z-normalization amplifies raw-score drift by 1/std(scores) — with
    random-init encoders the corpus cosine spread is ~0.02, so the <=1e-3
    raw drift becomes ~5e-2 in z units. 0.15 bounds that while still
    catching formula divergence, which is O(1)."""

    from mmrag_tpu.rag import retrieve as rv

    engine, ref, cfg = stacks
    for query in QUERIES:
        want = dict(_reference_pipeline(query, ref, cfg))
        got = rv.retrieve("u1", query, engine)
        for h in got["results"]:
            assert h["chunk_id"] in want
            np.testing.assert_allclose(
                h["combined_score"], want[h["chunk_id"]], atol=0.15
            )


def test_text_recall_ordering_matches(stacks):
    """The pre-fusion text recall list (bi-encoder ordering) agrees on the
    whole top-k, not just the final four — up to cross-platform score ties
    (random-init embeddings put unrelated chunks ~1e-5 apart; items whose
    reference scores differ by more than the drift budget must not swap)."""

    from mmrag_tpu.rag import retrieve as rv

    engine, ref, cfg = stacks
    query = QUERIES[0]
    r = cfg.retrieval
    qv = ref["minilm"]([query])[0]
    scores = ref["text_mat"] @ qv
    order = np.argsort(-scores)[: r.index_topk_text]
    want = [(ref["corpus"][i][0], float(scores[i])) for i in order]
    hits = rv.retrieve_text("u1", query, engine)
    got_ids = [h.chunk_id for h in hits]
    assert set(got_ids) == {cid for cid, _ in want}
    # walk reference groups of near-tied scores; ordering must match between
    # groups, membership within a group may permute
    pos = {cid: i for i, cid in enumerate(got_ids)}
    eps = 2.5e-3  # ~2x the 1e-3 cosine-drift budget, in raw-score units
    for (cid_a, sa), (cid_b, sb) in zip(want, want[1:]):
        if sa - sb > eps:
            assert pos[cid_a] < pos[cid_b], (cid_a, sa, cid_b, sb)


def test_positional_rerank_quirk():
    """The reference attaches rerank z-scores by LIST POSITION after the
    resort (retrieve.py:169-180) — when a non-reranked hit outsorts a
    reranked one, the positional z lands on the wrong item. Our fusion must
    reproduce that behavior exactly (deterministic synthetic case where the
    interleave happens)."""

    from mmrag_tpu.ops.fusion import fuse_results
    from mmrag_tpu.rag.retrieve import _with_rerank_scores
    from mmrag_tpu.storage.records import RetrievedHit

    def hit(cid, score):
        return RetrievedHit(chunk_id=cid, document_id="d", user_id="u",
                            modality="text", score=score, text=cid)

    # raw recall order: a > b > c > d; rerank depth 2 scores: b=0.9, a=0.1;
    # c's RAW score (0.5) outsorts a's RERANK score (0.1) -> interleave
    hits = [hit("a", 0.60), hit("b", 0.55), hit("c", 0.50), hit("d", 0.20)]
    merged = _with_rerank_scores(hits, np.asarray([0.1, 0.9]), rerank_topk=2)
    assert [h.chunk_id for h in merged] == ["b", "c", "d", "a"]
    fused = fuse_results(merged, [], final_n=4)

    # reference math, hand-evaluated: cos scores in resorted order
    # [b .55, c .50, d .20, a .60]; rerank values in resorted order
    # [b 0.9, a 0.1]; positional attachment gives b rz[0] and C (not a!)
    # rz[1] — a, despite being reranked, gets no rerank z at position 3
    cos = np.array([0.55, 0.50, 0.20, 0.60], np.float64)
    cz = (cos - cos.mean()) / cos.std()
    rr = np.array([0.9, 0.1], np.float64)
    rz = (rr - rr.mean()) / rr.std()
    want = {
        "b": np.mean([cz[0], rz[0]]),
        "c": np.mean([cz[1], rz[1]]),  # the quirk: c gets a's rerank z
        "d": cz[2],
        "a": cz[3],
    }
    for h in fused:
        np.testing.assert_allclose(h.combined_score, want[h.chunk_id], rtol=1e-6)
