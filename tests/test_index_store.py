"""VectorIndex: upsert/tombstone semantics, tenant+doc masking, growth,
compaction, persistence, batch search."""

import numpy as np
import pytest

from mmrag_tpu.index.store import VectorIndex
from mmrag_tpu.storage import VectorRow


def _row(cid, user="u1", doc="d1", vec=None, dim=8):
    if vec is None:
        vec = np.random.default_rng(abs(hash(cid)) % 2**31).standard_normal(dim)
    return VectorRow(
        chunk_id=cid, user_id=user, document_id=doc, modality="text",
        embedding=np.asarray(vec, dtype=np.float32),
    )


def _basis(i, dim=8):
    v = np.zeros(dim, dtype=np.float32)
    v[i] = 1.0
    return v


@pytest.fixture()
def index():
    return VectorIndex(dim=8, dtype="float32")


def test_upsert_and_search(index):
    index.upsert([_row(f"c{i}", vec=_basis(i)) for i in range(4)])
    assert len(index) == 4
    hits = index.search(_basis(2), "u1", k=2)
    assert hits[0][0] == "c2"
    assert hits[0][1] == pytest.approx(1.0, abs=1e-5)


def test_normalize_on_write(index):
    index.upsert([_row("c0", vec=_basis(0) * 50.0)])
    hits = index.search(_basis(0), "u1", k=1)
    assert hits[0][1] == pytest.approx(1.0, abs=1e-5)


def test_tenant_isolation(index):
    index.upsert([_row("a", user="u1", vec=_basis(0))])
    index.upsert([_row("b", user="u2", vec=_basis(0))])
    hits = index.search(_basis(0), "u1", k=10)
    assert [h[0] for h in hits] == ["a"]
    assert index.search(_basis(0), "unknown-user", k=5) == []


def test_document_filter_pre_topk(index):
    # Fill doc d1 with perfect matches; the d2 row is a weaker match. A
    # post-top-k filter (reference bug) would return nothing for d2 at k=1.
    index.upsert([_row(f"c{i}", doc="d1", vec=_basis(0)) for i in range(3)])
    index.upsert([_row("target", doc="d2", vec=_basis(0) * 0.5 + _basis(1))])
    hits = index.search(_basis(0), "u1", k=1, document_id="d2")
    assert [h[0] for h in hits] == ["target"]
    assert index.search(_basis(0), "u1", k=1, document_id="nope") == []


def test_upsert_replaces_chunk(index):
    index.upsert([_row("c0", vec=_basis(0))])
    index.upsert([_row("c0", vec=_basis(1))])  # delete-then-add
    assert len(index) == 1
    hits = index.search(_basis(1), "u1", k=5)
    assert hits[0][0] == "c0"
    assert index.search(_basis(0), "u1", k=5)[0][1] < 0.5


def test_delete_document(index):
    index.upsert([_row("c0", doc="d1"), _row("c1", doc="d2")])
    assert index.delete_document("d1") == 1
    assert len(index) == 1
    assert [h[0] for h in index.search(_basis(0), "u1", k=10)] != ["c0"]


def test_capacity_growth_preserves_rows(index):
    from mmrag_tpu.index import store as store_mod

    old_min = store_mod._MIN_CAPACITY
    store_mod._MIN_CAPACITY = 8
    try:
        idx = VectorIndex(dim=8, dtype="float32")
        for start in range(0, 40, 5):
            idx.upsert([_row(f"c{start + i}", vec=_basis((start + i) % 8)) for i in range(5)])
        assert len(idx) == 40
        hits = idx.search(_basis(3), "u1", k=40)
        assert len(hits) == 40  # every row survived the capacity doublings
        top5 = hits[:5]
        assert all(score == pytest.approx(1.0, abs=1e-5) for _, score in top5)
        assert {cid for cid, _ in top5} == {"c3", "c11", "c19", "c27", "c35"}
    finally:
        store_mod._MIN_CAPACITY = old_min


def test_compact_reclaims_tombstones(index):
    index.upsert([_row(f"c{i}", vec=_basis(i % 8)) for i in range(10)])
    index.upsert([_row(f"c{i}", vec=_basis(i % 8)) for i in range(10)])  # all replaced
    assert index._size == 20  # slab holds tombstones
    assert index.compact() == 10
    assert index._size == 10
    assert index.search(_basis(1), "u1", k=1)[0][0] == "c1"


def test_search_batch_multiple_queries(index):
    index.upsert([_row(f"c{i}", vec=_basis(i)) for i in range(4)])
    queries = np.stack([_basis(0), _basis(3)])
    results = index.search_batch(queries, "u1", k=1)
    assert results[0][0][0] == "c0" and results[1][0][0] == "c3"


def test_persistence_roundtrip(tmp_path, index):
    index.upsert([_row(f"c{i}", user=f"u{i % 2 + 1}", vec=_basis(i)) for i in range(4)])
    index.upsert([_row("c0", vec=_basis(5))])  # tombstone + rewrite
    index.save(str(tmp_path), "text")
    loaded = VectorIndex.load(str(tmp_path), "text", dtype="float32")
    assert len(loaded) == 4
    # u1 interned rows: c0 (rewritten as u1) and c2
    hits = loaded.search(_basis(5), "u1", k=5)
    assert hits[0][0] == "c0"


def test_load_or_create(tmp_path):
    idx = VectorIndex.load_or_create(str(tmp_path), "missing", dim=8, dtype="float32")
    assert len(idx) == 0 and idx.dim == 8


def test_dim_mismatch_raises(index):
    with pytest.raises(ValueError):
        index.upsert([_row("c0", vec=np.ones(16))])


def test_search_batch_multi_isolates_tenants(rng):
    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    index = VectorIndex(dim=8, dtype="float32")
    vecs = rng.standard_normal((6, 8)).astype(np.float32)
    rows = [
        VectorRow(chunk_id=f"c{i}", user_id="alice" if i < 3 else "bob",
                  document_id=f"d{i % 2}", modality="text", embedding=vecs[i])
        for i in range(6)
    ]
    index.upsert(rows)
    # query with each tenant's own vector: each must only see its tenant
    queries = np.stack([vecs[0], vecs[4]])
    out = index.search_batch_multi(queries, ["alice", "bob"], k=6)
    assert {c for c, _ in out[0]} == {"c0", "c1", "c2"}
    assert {c for c, _ in out[1]} == {"c3", "c4", "c5"}
    # top hit is the query's own row
    assert out[0][0][0] == "c0" and out[1][0][0] == "c4"


def test_search_batch_multi_doc_filter_and_unknowns(rng):
    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    index = VectorIndex(dim=4, dtype="float32")
    vecs = rng.standard_normal((4, 4)).astype(np.float32)
    index.upsert([
        VectorRow(chunk_id=f"c{i}", user_id="u", document_id=f"d{i % 2}",
                  modality="text", embedding=vecs[i])
        for i in range(4)
    ])
    queries = np.stack([vecs[0]] * 3)
    out = index.search_batch_multi(
        queries, ["u", "u", "ghost"], k=4, document_ids=["d0", "nope", None]
    )
    assert {c for c, _ in out[0]} == {"c0", "c2"}  # doc filter pushed into mask
    assert out[1] == []  # unknown doc matches nothing
    assert out[2] == []  # unknown tenant matches nothing


def test_search_batch_multi_approx_backend(rng):
    """Regression: the approx backend must handle per-query (q, n) masks."""

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    index = VectorIndex(dim=8, dtype="float32", backend="approx")
    vecs = rng.standard_normal((8, 8)).astype(np.float32)
    index.upsert([
        VectorRow(chunk_id=f"c{i}", user_id="a" if i < 4 else "b",
                  document_id="d", modality="text", embedding=vecs[i])
        for i in range(8)
    ])
    out = index.search_batch_multi(np.stack([vecs[0], vecs[5]]), ["a", "b"], k=4)
    assert out[0] and out[1]
    assert all(c.startswith("c") and int(c[1:]) < 4 for c, _ in out[0])
    assert all(int(c[1:]) >= 4 for c, _ in out[1])


def test_int8_index_mode(rng):
    """Opt-in int8 storage: half the HBM per row, ~1% score error, exact
    tenant masking, dequantized persistence roundtrip."""

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    vecs = rng.standard_normal((32, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [
        VectorRow(chunk_id=f"c{i}", user_id="a" if i < 16 else "b",
                  document_id="d", modality="text", embedding=vecs[i])
        for i in range(32)
    ]
    i8 = VectorIndex(dim=16, dtype="int8")
    f32 = VectorIndex(dim=16, dtype="float32")
    i8.upsert(rows)
    f32.upsert(rows)

    hits8 = i8.search(vecs[3], "a", k=5)
    hits32 = f32.search(vecs[3], "a", k=5)
    assert hits8[0][0] == "c3"  # own row wins despite quantization
    assert abs(hits8[0][1] - 1.0) < 0.03  # ~1% quant error budget
    # top-5 recall vs exact
    overlap = {c for c, _ in hits8} & {c for c, _ in hits32}
    assert len(overlap) >= 4
    # tenant isolation intact
    assert all(int(c[1:]) < 16 for c, _ in hits8)

    # multi-tenant batched path
    out = i8.search_batch_multi(np.stack([vecs[3], vecs[20]]), ["a", "b"], k=4)
    assert out[0][0][0] == "c3" and out[1][0][0] == "c20"


def test_int8_persistence_roundtrip(rng, tmp_path):
    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    vecs = rng.standard_normal((8, 8)).astype(np.float32)
    index = VectorIndex(dim=8, dtype="int8")
    index.upsert([
        VectorRow(chunk_id=f"c{i}", user_id="u", document_id="d",
                  modality="text", embedding=vecs[i])
        for i in range(8)
    ])
    index.save(str(tmp_path), "t")
    back = VectorIndex.load(str(tmp_path), "t", dtype="int8")
    assert len(back) == 8
    hits = back.search(vecs[2] / np.linalg.norm(vecs[2]), "u", k=1)
    assert hits[0][0] == "c2"
    # compaction after tombstones keeps int8 mode working
    index.delete_document("d")
    assert index.compact() == 0


def test_concurrent_upsert_search_compact(rng):
    """Race-safety: concurrent writers/readers/compaction never corrupt the
    index — every search returns only live chunks of the right tenant and
    the final state matches the sum of writes (SURVEY §5 race fixes)."""

    import threading

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    index = VectorIndex(dim=8, dtype="float32")
    vecs = rng.standard_normal((64, 8)).astype(np.float32)
    errors = []

    def writer(tid):
        try:
            for i in range(8):
                index.upsert([
                    VectorRow(chunk_id=f"t{tid}-c{i}", user_id=f"u{tid}",
                              document_id=f"d{tid}", modality="text",
                              embedding=vecs[(tid * 8 + i) % 64])
                ])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def reader(tid):
        try:
            for _ in range(6):
                hits = index.search(vecs[tid], f"u{tid % 4}", k=5)
                for cid, _score in hits:
                    assert cid.startswith(f"t{tid % 4}-"), cid
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def compactor():
        try:
            for _ in range(3):
                index.compact()
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = (
        [threading.Thread(target=writer, args=(t,)) for t in range(4)]
        + [threading.Thread(target=reader, args=(t,)) for t in range(4)]
        + [threading.Thread(target=compactor)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(index) == 32  # 4 writers x 8 rows, all live post-compaction
    for tid in range(4):
        hits = index.search(vecs[tid * 8], f"u{tid}", k=10)
        assert hits and all(c.startswith(f"t{tid}-") for c, _ in hits)


def test_int8_save_load_bit_exact(rng, tmp_path):
    """Persisted int8 rows+scales reload without requantization drift."""

    import jax.numpy as jnp

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    vecs = rng.standard_normal((12, 8)).astype(np.float32)
    index = VectorIndex(dim=8, dtype="int8")
    index.upsert([
        VectorRow(chunk_id=f"c{i}", user_id="u", document_id="d",
                  modality="text", embedding=vecs[i])
        for i in range(12)
    ])
    index.save(str(tmp_path), "t")
    with np.load(str(tmp_path / "t.npz")) as data:
        assert "embeddings_int8" in data and "scales" in data
    back = VectorIndex.load(str(tmp_path), "t", dtype="int8")
    np.testing.assert_array_equal(
        np.asarray(back._slab[:12]), np.asarray(index._slab[:12]))
    np.testing.assert_array_equal(
        np.asarray(back._scales[:12]), np.asarray(index._scales[:12]))
    # and a dtype switch between runs still loads (dequantized)
    as_f32 = VectorIndex.load(str(tmp_path), "t", dtype="float32")
    assert len(as_f32) == 12


def test_int8_rejects_incompatible_backend():
    from mmrag_tpu.index.store import VectorIndex

    with pytest.raises(ValueError, match="int8 index supports"):
        VectorIndex(dim=8, dtype="int8", backend="pallas")


def test_search_runtime_fallback_to_xla(rng):
    """A runtime TPU failure on a fancy backend retries on dense xla."""

    import jax

    from mmrag_tpu.index.store import VectorIndex

    index = VectorIndex(dim=4, dtype="float32", backend="pallas")
    calls = []

    def fake_fn(*args):
        backend = args[-1]
        calls.append(backend)
        if backend != "xla":
            raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: TPU backend error")
        return np.ones((1, 2), np.float32), np.zeros((1, 2), np.int32)

    from mmrag_tpu.utils.profiling import metrics

    before = metrics.summary()["counters"].get("index.backend_fallback", 0)
    scores, idx = index._search_with_fallback(fake_fn, "ignored")
    assert calls == ["pallas", "xla"]
    assert scores.shape == (1, 2)
    # degrade events are production-observable via /metrics (VERDICT r1 #9)
    after = metrics.summary()["counters"]
    assert after.get("index.backend_fallback", 0) == before + 1
    assert after.get("index.backend_fallback.dense", 0) >= 1

    # xla backend re-raises (nothing to fall back to)
    index_xla = VectorIndex(dim=4, dtype="float32", backend="xla")

    def always_fail(*args):
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT")

    with pytest.raises(jax.errors.JaxRuntimeError):
        index_xla._search_with_fallback(always_fail, "ignored")


def test_upsert_validation_precedes_tombstone(index):
    """A rejected upsert must not delete the rows it failed to replace."""

    import numpy as np

    from mmrag_tpu.storage.records import VectorRow

    index.upsert([VectorRow(chunk_id="keep", user_id="u", document_id="d",
                            modality="text", embedding=np.ones(index.dim, np.float32))])
    bad = [VectorRow(chunk_id="keep", user_id="u", document_id="d",
                     modality="text", embedding=np.ones(index.dim + 8, np.float32))]
    with pytest.raises(ValueError):
        index.upsert(bad)
    hits = index.search(np.ones(index.dim, np.float32), "u", k=1)
    assert hits and hits[0][0] == "keep"  # original row survived


def test_load_refuses_mismatched_snapshot(tmp_path, index):
    """Ids/embeddings length disagreement (legacy crash artifact) raises
    instead of silently zipping wrong rows to wrong tenants."""

    import json

    import numpy as np

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    rng = np.random.default_rng(0)
    rows = [VectorRow(chunk_id=f"c{i}", user_id="u", document_id="d",
                      modality="text",
                      embedding=rng.standard_normal(index.dim).astype(np.float32))
            for i in range(4)]
    index.upsert(rows)
    index.save(str(tmp_path), "snap")
    # simulate the pre-atomic failure mode: stale manifest, fewer ids
    npz = dict(np.load(tmp_path / "snap.npz"))
    for key in ("chunk_ids", "user_ids", "document_ids"):
        del npz[key]  # legacy snapshot: ids only in the manifest
    np.savez(tmp_path / "snap.npz", **npz)
    # legacy snapshots carried ids in the manifest; simulate one that is
    # stale (2 ids vs 4 embeddings)
    manifest = json.loads((tmp_path / "snap.manifest.json").read_text())
    manifest["chunk_ids"] = ["c0", "c1"]
    manifest["user_ids"] = ["u", "u"]
    manifest["document_ids"] = ["d", "d"]
    (tmp_path / "snap.manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="refusing"):
        VectorIndex.load(str(tmp_path), "snap", dtype="float32")


def test_search_batch_multi_async_matches_sync(index):
    """The dispatch/collect split (serving hot path) returns exactly what the
    synchronous form returns, for device-array queries too."""

    import jax.numpy as jnp

    index.upsert([_row(f"c{i}", user=f"u{i % 2}", vec=_basis(i)) for i in range(6)])
    queries = np.stack([_basis(i) for i in range(3)])
    users = ["u0", "u1", "u0"]
    sync = index.search_batch_multi(queries, users, k=3)
    pending = index.search_batch_multi_async(jnp.asarray(queries), users, k=3)
    assert pending() == sync
    # empty-index short circuit returns a collector as well
    empty = VectorIndex(dim=8, dtype="float32")
    assert empty.search_batch_multi_async(queries, users, k=3)() == [[], [], []]


def test_query_batch_bucketing_pads_and_slices():
    """Any coalesce size returns exactly its own results — pad rows carry the
    never-matching tenant sentinel and are sliced off."""

    index = VectorIndex(dim=8, dtype="float32")
    index.upsert([_row(f"c{i}", vec=_basis(i)) for i in range(8)])
    for q in (1, 2, 3, 5, 7):
        queries = np.stack([_basis(i % 8) for i in range(q)])
        out = index.search_batch_multi(queries, ["u1"] * q, k=2)
        assert len(out) == q
        for i, hits in enumerate(out):
            assert hits[0][0] == f"c{i % 8}"


def test_warmup_sweeps_every_coalesce_length(tmp_path, monkeypatch):
    """warmup_serving must drive the LIVE pipeline at EVERY coalesce length
    1..max (r4 warm-window compile guard: partial-length slices and the
    device-side pad are shape-specialized per exact length, so warming only
    bucket boundaries leaves odd coalesces paying mid-request compiles) —
    and the search warm must hand a DEVICE array (store._pad_queries pads
    on device only for jax.Array inputs; a numpy warmup compiles the wrong
    executable)."""

    import jax

    from tiny import tiny_engine

    engine = tiny_engine(tmp_path, extra_env={"TPU_COMPILE_CACHE_DIR": ""})
    from mmrag_tpu.rag import index_build as ib
    from mmrag_tpu.storage import Document

    engine.metadata.upsert_document(
        Document(document_id="d", user_id="u1", doc_type="pdf", title="T"))
    ib.index_text_nodes(
        "u1", [{"id": "c0", "text": "alpha beta " * 30,
                "metadata": {"document_id": "d", "page": 1}}], engine)

    seen_lengths = []
    orig = type(engine.text_index).search_batch_multi_async

    def spy(self, queries, users, k, docs=None):
        seen_lengths.append(len(users))
        assert isinstance(queries, jax.Array), type(queries)
        return orig(self, queries, users, k, docs)

    monkeypatch.setattr(type(engine.text_index),
                        "search_batch_multi_async", spy)
    engine.warmup_serving(max_coalesce=5)
    assert sorted(seen_lengths) == [1, 2, 3, 4, 5]
    engine.close()


def test_capped_batch_respects_dispatch_token_cap():
    """No batch bucket choice may exceed the padded-token dispatch cap at
    any seq bucket (review finding: the 2048 rung bypassed the cap in the
    rerank/CLIP-text/list-fallback paths)."""

    from mmrag_tpu.models.runtime import _DISPATCH_TOKEN_CAP, _capped_batch

    buckets = (8, 32, 128, 512, 2048)
    assert _capped_batch(buckets, 64) == 2048
    assert _capped_batch(buckets, 256) == 512  # the rerank shape
    assert _capped_batch(buckets, 512) == 512  # the ingest splitter shape
    assert _capped_batch(buckets, 77) == 2048  # CLIP text
    # degenerate: even the smallest bucket over the cap still returns it
    assert _capped_batch((8,), 10**6) == 8
    for seq in (64, 77, 128, 256, 512):
        b = _capped_batch(buckets, seq)
        assert b == buckets[0] or b * seq <= _DISPATCH_TOKEN_CAP


def test_engine_warmup_serving(tmp_path):
    """warmup_serving pre-compiles every coalesce bucket without touching
    real rows (the warmup tenant is never interned) and leaves retrieval
    results unchanged."""

    from mmrag_tpu.rag import index_build as ib
    from mmrag_tpu.storage import Document
    from tiny import tiny_engine

    # tiny towers: the subject is the warmup bucket sweep, not encoder
    # numerics — full-size towers cost ~4 min of CPU compile here
    engine = tiny_engine(tmp_path, extra_env={"TPU_COMPILE_CACHE_DIR": ""})
    engine.metadata.upsert_document(
        Document(document_id="d", user_id="u1", doc_type="pdf", title="T")
    )
    ib.index_text_nodes(
        "u1",
        [{"id": "c0", "text": "alpha beta gamma " * 20,
          "metadata": {"document_id": "d", "page": 1}}],
        engine,
    )
    before = engine.text_index.search_batch_multi(
        np.ones((1, engine.text_index.dim), np.float32), ["u1"], k=1
    )
    n = engine.warmup_serving(max_coalesce=4)
    assert n >= 8  # >= (2 embed + 1 text search + 1 rerank) per bucket
    after = engine.text_index.search_batch_multi(
        np.ones((1, engine.text_index.dim), np.float32), ["u1"], k=1
    )
    assert after == before  # warmup left the corpus untouched
    engine.close()


def test_readback_pair_bit_exact_and_passthrough(rng):
    """The single-round-trip (scores, ids) materialization must round-trip
    every bit: the packed transfer is INTEGER on purpose (f32 lanes quiet
    signalling-NaN bit patterns on the real chip — measured; int lanes
    survive). Checked here against adversarial NaN/Inf/denormal score bit
    patterns and full-range int32 ids; np inputs pass through untouched."""

    import jax
    import jax.numpy as jnp

    from mmrag_tpu.index.store import _readback_pair

    s_bits = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, (7, 33), dtype=np.int64).astype(np.int32)
    )
    s = jax.lax.bitcast_convert_type(s_bits, jnp.float32)
    i = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, (7, 33), dtype=np.int64).astype(np.int32)
    )
    sh, ih = _readback_pair(s, i)
    assert sh.dtype == np.float32 and ih.dtype == np.int32
    np.testing.assert_array_equal(sh.view(np.int32), np.asarray(s).view(np.int32))
    np.testing.assert_array_equal(ih, np.asarray(i))

    s_np, i_np = np.ones((2, 3), np.float32), np.zeros((2, 3), np.int32)
    sh, ih = _readback_pair(s_np, i_np)
    np.testing.assert_array_equal(sh, s_np)
    np.testing.assert_array_equal(ih, i_np)


def test_async_readback_retry_is_bounded_and_recovers(index, monkeypatch):
    """A readback JaxRuntimeError re-runs the search with fresh refs; a
    PERSISTENT failure walks a bounded ladder (fresh refs -> dense xla ->
    raise) instead of recursing forever (regression: the fallback used to
    re-enter the identical async path unboundedly)."""

    import jax

    from mmrag_tpu.index import store as store_mod

    index.upsert([_row(f"c{i}", user=f"u{i % 2}", vec=_basis(i)) for i in range(6)])
    queries = np.stack([_basis(i) for i in range(3)])
    users = ["u0", "u1", "u0"]
    expected = index.search_batch_multi(queries, users, k=3)

    real = store_mod._readback_pair
    calls = {"n": 0}

    # one transient failure -> fresh-refs re-run returns correct results
    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: injected")
        return real(*a, **kw)

    monkeypatch.setattr(store_mod, "_readback_pair", flaky)
    assert index.search_batch_multi_async(queries, users, k=3)() == expected

    # persistent failure -> bounded attempts, original error propagates
    calls["n"] = 0

    def poisoned(*a, **kw):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: injected")

    monkeypatch.setattr(store_mod, "_readback_pair", poisoned)
    with pytest.raises(jax.errors.JaxRuntimeError):
        index.search_batch_multi_async(queries, users, k=3)()
    assert calls["n"] <= 3  # attempt 0, fresh-refs, forced dense-xla


def test_async_readback_retry_int8_dense_stops_after_fresh_refs(monkeypatch):
    """A plain-dense int8 index has no lower rung to descend to (the
    attempt-2 "force dense xla" override is ignored by the int8 branch),
    so a persistent failure stops after ONE fresh-refs retry instead of
    paying a third identical _search_multi_int8 dispatch."""

    import jax

    from mmrag_tpu.index import store as store_mod

    index = VectorIndex(dim=8, dtype="int8")
    index.upsert([_row(f"c{i}", user="u0", vec=_basis(i)) for i in range(4)])
    queries = np.stack([_basis(i) for i in range(2)])
    users = ["u0", "u0"]

    calls = {"n": 0}

    def poisoned(*a, **kw):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: injected")

    monkeypatch.setattr(store_mod, "_readback_pair", poisoned)
    with pytest.raises(jax.errors.JaxRuntimeError):
        index.search_batch_multi_async(queries, users, k=2)()
    assert calls["n"] == 2  # attempt 0 + fresh refs; no identical third run


def test_background_ivf_build_does_not_abort_interpreter_exit():
    """A daemon ivf-build thread killed by interpreter teardown while inside
    an XLA dispatch aborts the whole process (SIGABRT, "FATAL: exception not
    rethrown"). The module's atexit hook must join in-flight builds first, so
    a process that kicks an async build and exits immediately exits 0."""

    import subprocess
    import sys

    script = """
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from mmrag_tpu.index.store import VectorIndex
from mmrag_tpu.storage import VectorRow
rng = np.random.default_rng(0)
rows = []
for i in range(2000):
    v = rng.normal(size=32).astype(np.float32)
    rows.append(VectorRow(chunk_id=f"c{i}", user_id="u", document_id="d",
                          modality="text", embedding=v / np.linalg.norm(v)))
idx = VectorIndex(dim=32, backend="ivf", ivf_min_rows=500)
idx.upsert(rows)
q = rng.normal(size=(1, 32)).astype(np.float32)
idx.search_batch_multi(q / np.linalg.norm(q), ["u"], k=5)
# exit immediately: the background k-means is still mid-dispatch
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-2000:])


def test_engine_warmup_serving_honors_stop(tmp_path):
    """A shutting-down server sets the stop event and joins warmup; a
    pre-set event must return before issuing any dispatch (checked at each
    bucket boundary)."""

    import threading

    from tiny import tiny_engine

    engine = tiny_engine(tmp_path, extra_env={"TPU_COMPILE_CACHE_DIR": ""})
    stop = threading.Event()
    stop.set()
    assert engine.warmup_serving(max_coalesce=4, stop=stop) == 0
    engine.close()
