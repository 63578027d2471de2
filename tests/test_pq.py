"""PQ codebook training, ADC search, and exact refine (ops/pq.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mmrag_tpu.ops import pq  # noqa: E402
from mmrag_tpu.ops.topk import cosine_topk, l2_normalize  # noqa: E402


def _clustered(rng, n=4096, d=64, centers=32, noise=0.25):
    """Embedding-like geometry: clustered rows on the sphere."""

    c = rng.standard_normal((centers, d)).astype(np.float32)
    rows = c[rng.integers(0, centers, n)] + noise * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return np.asarray(l2_normalize(jnp.asarray(rows)))


def test_train_encode_shapes(rng):
    rows = jnp.asarray(_clustered(rng, n=1024, d=64))
    books = pq.train_pq(rows, m=8, iters=4)
    assert books.shape == (8, pq.PQ_K, 8)
    codes = pq.pq_encode(rows, books)
    assert codes.shape == (1024, 8) and codes.dtype == jnp.int8


def test_reconstruction_quality_on_clustered_data(rng):
    rows = jnp.asarray(_clustered(rng, n=4096, d=64))
    books = pq.train_pq(rows, m=8, iters=8)
    cos = pq.PQData(books).reconstruction_cosine(rows)
    # clustered 64-d rows at 8x256 codes reconstruct well
    assert cos > 0.9, cos


def test_adc_topk_recall_and_refine(rng):
    """The product shape (d=384, m=16 like the reference's num_sub_vectors):
    ADC alone ranks usably; refined at 16x depth recall@10 is ~exact
    (measured 1.00 across clustered geometries — the store's default)."""

    rows_np = _clustered(rng, n=4096, d=384, centers=256)
    rows = jnp.asarray(rows_np)
    books = pq.train_pq(rows, m=16, iters=8)
    codes = pq.pq_encode(rows, books)
    queries_np = rows_np[:16] + 0.05 * rng.standard_normal((16, 384)).astype(
        np.float32
    )
    queries_np = np.asarray(l2_normalize(jnp.asarray(queries_np)))
    queries = jnp.asarray(queries_np)
    mask = jnp.ones((4096,), bool)

    exact_i = np.asarray(cosine_topk(queries, rows, mask, 10, backend="xla")[1])
    cand_s, cand_i = pq.pq_topk(queries, books, codes, mask, 160)
    ref_s, ref_i = pq.refine_exact(
        queries_np, rows_np, np.asarray(cand_i), np.asarray(cand_s), 10
    )

    adc = np.asarray(pq.pq_topk(queries, books, codes, mask, 10)[1])
    recall_adc = np.mean([
        len(set(adc[i]) & set(exact_i[i])) / 10 for i in range(16)
    ])
    recall_ref = np.mean([
        len(set(ref_i[i]) & set(exact_i[i])) / 10 for i in range(16)
    ])
    assert recall_adc >= 0.25, recall_adc  # quantization-error ties reshuffle
    assert recall_ref >= 0.95, (recall_ref, recall_adc)
    # refined scores are TRUE cosines of the returned rows
    np.testing.assert_allclose(
        ref_s[0], np.asarray(rows_np[ref_i[0]] @ queries_np[0]), atol=1e-5
    )


def test_adc_respects_predicate_mask(rng):
    rows = jnp.asarray(_clustered(rng, n=512, d=32))
    books = pq.train_pq(rows, m=4, iters=4)
    codes = pq.pq_encode(rows, books)
    queries = rows[:3]
    mask = np.zeros((3, 512), bool)
    mask[0, :10] = True
    mask[1, 10:20] = True  # disjoint tenants
    mask[2, :] = False  # nothing visible
    s, i = pq.pq_topk(queries, books, codes, jnp.asarray(mask), 5)
    s, i = np.asarray(s), np.asarray(i)
    assert set(i[0]) <= set(range(10))
    assert set(i[1]) <= set(range(10, 20))
    assert (s[2] <= -1e29).all()


def test_refine_keeps_filler_sentinels(rng):
    rows = _clustered(rng, n=64, d=32)
    q = rows[:2]
    cand_i = np.array([[0, 1, -1], [2, -1, -1]], np.int32)
    neg = np.float32(-1e30)
    cand_s = np.array([[0.9, 0.8, neg], [0.7, neg, neg]], np.float32)
    s, i = pq.refine_exact(q, rows, cand_i, cand_s, 3)
    assert (s[0][2:] <= -1e29).all() and (s[1][1:] <= -1e29).all()


def test_fused_adc_matches_scan(rng):
    """The fused Pallas two-phase path (>= ADC_TILE rows routes there;
    interpret mode on CPU) returns the same scores and ids as the scan
    path — both consume the same bf16-rounded tables, and phase B's
    k+margin buckets cover the ADC top-k exactly."""

    n = pq.ADC_TILE * 2 + 700  # non-tile-multiple: exercises row padding
    rows = jnp.asarray(_clustered(rng, n=n, d=64, centers=64))
    books = pq.train_pq(rows, m=8, iters=4)
    codes = pq.pq_encode(rows, books)
    queries = rows[:5]  # q=5: exercises query padding to 8
    mask = np.ones((n,), bool)
    mask[::7] = False  # shared mask with dead rows
    sf, if_ = pq.pq_topk(queries, books, codes, jnp.asarray(mask), 20)
    ss, is_ = pq._pq_topk_scan(queries, books, codes, jnp.asarray(mask), 20)
    sf, if_, ss, is_ = map(np.asarray, (sf, if_, ss, is_))
    # both paths sum the same bf16 table entries in f32: score vectors are
    # bit-equal; ids may tie-swap (phase C breaks ties in bucket order, the
    # scan in global order), so ids are checked score-by-score
    np.testing.assert_array_equal(sf, ss)
    tables = np.asarray(
        pq._adc_tables(queries, books).astype(jnp.bfloat16), np.float32
    )  # (m, K, q)
    codes_np = np.asarray(codes, np.int64) + 128
    m = tables.shape[0]
    for qi in range(5):
        fused_scores = sum(
            tables[j, codes_np[if_[qi], j], qi] for j in range(m)
        ).astype(np.float32)
        np.testing.assert_array_equal(fused_scores, sf[qi])
        swapped = if_[qi] != is_[qi]
        assert (sf[qi][swapped] == ss[qi][swapped]).all()  # ties only

    # per-query tenant masks through the fused path
    qmask = np.zeros((5, n), bool)
    qmask[0, :50] = True
    qmask[1, 50:100] = True
    qmask[2, :] = False
    qmask[3, -30:] = True  # rows in the padded tail's last real tile
    qmask[4, :] = True
    sf, if_ = pq.pq_topk(queries, books, codes, jnp.asarray(qmask), 10)
    sf, if_ = np.asarray(sf), np.asarray(if_)
    assert set(if_[0][sf[0] > -1e29]) <= set(range(50))
    assert set(if_[1][sf[1] > -1e29]) <= set(range(50, 100))
    assert (sf[2] <= -1e29).all()
    assert set(if_[3][sf[3] > -1e29]) <= set(range(n - 30, n))
    ss, is_ = pq._pq_topk_scan(queries, books, codes, jnp.asarray(qmask), 10)
    np.testing.assert_array_equal(if_[sf > -1e29], np.asarray(is_)[sf > -1e29])


def test_wraps_when_fewer_rows_than_centroids(rng):
    rows = jnp.asarray(_clustered(rng, n=100, d=32))
    books = pq.train_pq(rows, m=4, iters=2)
    assert books.shape == (4, 256, 8)
    codes = pq.pq_encode(rows, books)
    assert codes.shape == (100, 4)


# ---------------------------------------------------------------------------
# VectorIndex pq mode (TPU_INDEX_DTYPE=pq)
# ---------------------------------------------------------------------------


def _mk_rows(rng, n, d=64, user="u1", doc="d1", start=0):
    from mmrag_tpu.storage.records import VectorRow

    mat = _clustered(rng, n=n, d=d, centers=16)
    return [
        VectorRow(chunk_id=f"c{start + i}", user_id=user, document_id=doc,
                  modality="text", embedding=mat[i])
        for i in range(n)
    ], mat


def test_index_pq_matches_exact_ordering(rng):
    from mmrag_tpu.index.store import VectorIndex

    rows, mat = _mk_rows(rng, 512)
    exact = VectorIndex(dim=64, dtype="float32", backend="xla")
    pq_ix = VectorIndex(dim=64, dtype="pq")
    exact.upsert(rows)
    pq_ix.upsert(rows)
    assert pq_ix.is_pq and pq_ix._pq is not None
    assert pq_ix._slab.shape[1] == 16 and pq_ix._slab.dtype == jnp.int8

    q = mat[:8] + 0.05 * rng.standard_normal((8, 64)).astype(np.float32)
    want = exact.search_batch(q, "u1", k=5)
    got = pq_ix.search_batch(q, "u1", k=5)
    # refined scores are exact cosines, so ids AND scores line up
    for w, g in zip(want, got):
        assert [c for c, _ in w] == [c for c, _ in g]
        np.testing.assert_allclose(
            [s for _, s in w], [s for _, s in g], atol=2e-2
        )  # exact index stores f32; pq refine rescores f32 originals


def test_index_pq_tenant_isolation_and_delete(rng):
    from mmrag_tpu.index.store import VectorIndex

    rows_a, mat_a = _mk_rows(rng, 64, user="alice", doc="da")
    rows_b, _ = _mk_rows(rng, 64, user="bob", doc="db", start=64)
    ix = VectorIndex(dim=64, dtype="pq")
    ix.upsert(rows_a)
    ix.upsert(rows_b)
    hits = ix.search_batch(mat_a[:4], "alice", k=8)
    assert all(c.startswith("c") and int(c[1:]) < 64 for h in hits for c, _ in h)
    hits_multi = ix.search_batch_multi(
        mat_a[:2], ["alice", "bob"], k=8
    )
    assert all(int(c[1:]) < 64 for c, _ in hits_multi[0])
    assert all(int(c[1:]) >= 64 for c, _ in hits_multi[1])
    ix.delete_document("da")
    assert ix.search_batch(mat_a[:2], "alice", k=4) == [[], []]


def test_index_pq_save_load_compact_roundtrip(tmp_path, rng):
    from mmrag_tpu.index.store import VectorIndex

    rows, mat = _mk_rows(rng, 256)
    ix = VectorIndex(dim=64, dtype="pq")
    ix.upsert(rows)
    before = ix.search_batch(mat[:4], "u1", k=5)
    ix.save(str(tmp_path), "t")
    loaded = VectorIndex.load(str(tmp_path), "t", dtype="pq")
    assert loaded.is_pq and loaded._size == 256
    # warm restart: the snapshot's codebooks installed VERBATIM (a retrain
    # on the bf16-rounded reloaded originals would differ) and codes too
    np.testing.assert_array_equal(
        np.asarray(loaded._pq.codebooks), np.asarray(ix._pq.codebooks)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded._slab[:256]), np.asarray(ix._slab[:256])
    )
    after = loaded.search_batch(mat[:4], "u1", k=5)
    for b, a in zip(before, after):
        assert [c for c, _ in b] == [c for c, _ in a]
    # pq_m changed between runs: codes don't fit -> re-upsert path retrains
    remixed = VectorIndex.load(str(tmp_path), "t", dtype="pq", pq_m=32)
    assert remixed.pq_m == 32 and remixed._slab.shape[1] == 32
    re_hits = remixed.search_batch(mat[:4], "u1", k=5)
    for b, a in zip(before, re_hits):
        assert [c for c, _ in b] == [c for c, _ in a]
    # compact retrains and re-encodes; results stay identical
    loaded.compact()
    post = loaded.search_batch(mat[:4], "u1", k=5)
    for b, p in zip(before, post):
        assert [c for c, _ in b] == [c for c, _ in p]


def test_index_pq_retrains_on_growth(rng):
    from mmrag_tpu.index.store import VectorIndex

    ix = VectorIndex(dim=64, dtype="pq")
    rows, _ = _mk_rows(rng, 32)
    ix.upsert(rows)
    t0 = ix._pq_trained_at
    assert t0 == 32
    rows2, _ = _mk_rows(rng, 128, start=32)
    ix.upsert(rows2)  # 160 >= 4*32 -> retrain + full re-encode
    assert ix._pq_trained_at == 160
    rows3, _ = _mk_rows(rng, 32, start=160)
    ix.upsert(rows3)  # 192 < 4*160 -> incremental encode only
    assert ix._pq_trained_at == 160 and ix._size == 192


def test_index_pq_sharded_matches_single_device(rng):
    """Multi-chip pq mode (8-virtual-device CPU mesh): the code slab is
    row-sharded, ADC runs per shard under shard_map with the all_gather
    candidate merge (parallel/sharded_index.py::sharded_search_pq_fn), and
    the host refine consumes merged GLOBAL row ids — results match the
    single-device pq index on ids AND scores (refined scores are exact
    cosines on both paths)."""

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(model_parallel=1)
    rows, mat = _mk_rows(rng, 500)
    rows2, _ = _mk_rows(rng, 300, user="u2", doc="d2", start=500)
    single = VectorIndex(dim=64, dtype="pq")
    sharded = VectorIndex(dim=64, dtype="pq", mesh=mesh)
    for ix in (single, sharded):
        ix.upsert(rows)
        ix.upsert(rows2)
    assert sharded._sharding is not None  # code slab actually row-sharded
    assert sharded._slab.shape[1] == 16 and sharded._slab.dtype == jnp.int8

    q = mat[:4] + 0.05 * rng.standard_normal((4, 64)).astype(np.float32)
    for user, doc in [("u1", None), ("u2", "d2"), ("u1", "d2")]:
        a = single.search_batch(q, user, k=8, document_id=doc)
        b = sharded.search_batch(q, user, k=8, document_id=doc)
        for ha, hb in zip(a, b):
            assert [c for c, _ in ha] == [c for c, _ in hb]
            np.testing.assert_allclose(
                [s for _, s in ha], [s for _, s in hb], rtol=1e-5
            )

    users = ["u1", "u2", "nobody", "u1"]
    docs = [None, "d2", None, "d2"]
    am = single.search_batch_multi(q, users, 8, docs)
    bm = sharded.search_batch_multi(q, users, 8, docs)
    for ha, hb in zip(am, bm):
        assert [c for c, _ in ha] == [c for c, _ in hb]
    assert am[2] == [] and bm[2] == []  # unknown tenant isolated
    assert am[3] == [] and bm[3] == []  # u1 has no doc d2


def test_index_pq_rejects_kernel_backends():
    from mmrag_tpu.index.store import VectorIndex

    with pytest.raises(ValueError):
        VectorIndex(dim=64, dtype="pq", backend="pallas")


def test_index_pq_ivf_composes(rng):
    """TPU_TOPK_BACKEND=ivf + TPU_INDEX_DTYPE=pq: the literal IVF_PQ.
    Clustering runs on the host originals, buckets hold m-byte codes,
    probes score by ADC against the layout's snapshot codebooks, the
    append tail scores flat-ADC with the current codebooks, and the exact
    host refine rescores the merged shortlist — so hits carry true
    cosines."""

    from mmrag_tpu.index.store import VectorIndex

    rows, mat = _mk_rows(rng, 600)
    ix = VectorIndex(dim=64, dtype="pq", backend="ivf", ivf_min_rows=256)
    ix.ivf_build_async = False
    ix.upsert(rows)
    hits = ix.search_batch(mat[7:8], "u1", k=3)[0]
    assert ix._ivf is not None and ix._ivf.is_pq
    assert ix._ivf.buckets.shape[2] == ix.pq_m  # coded buckets
    assert hits and hits[0][0] == "c7" and hits[0][1] > 0.97

    # probed + refined results match the flat pq index (same refine depth;
    # generous shortlist, so partial probing keeps the true top-k)
    flat = VectorIndex(dim=64, dtype="pq")
    flat.upsert(rows)
    q = mat[:4] + 0.05 * rng.standard_normal((4, 64)).astype(np.float32)
    a = ix.search_batch(q, "u1", k=5)
    b = flat.search_batch(q, "u1", k=5)
    for ha, hb in zip(a, b):
        assert [c for c, _ in ha] == [c for c, _ in hb]
        np.testing.assert_allclose(
            [s for _, s in ha], [s for _, s in hb], atol=1e-5
        )

    # append tail: scored flat-ADC with current codebooks, merged, refined
    rows2, mat2 = _mk_rows(rng, 64, start=600)
    ix.upsert(rows2)
    tail_hits = ix.search_batch(mat2[11:12], "u1", k=3)[0]
    assert tail_hits and tail_hits[0][0] == "c611"

    # tenant isolation through the coded probe path
    rows_b, mat_b = _mk_rows(rng, 64, user="bob", doc="db", start=700)
    ix.upsert(rows_b)
    assert all(
        int(c[1:]) >= 700
        for c, _ in ix.search_batch(mat_b[:1], "bob", k=5)[0]
    )
    # deletes flow into the layout
    ix.delete_document("db")
    assert ix.search_batch(mat_b[:1], "bob", k=5) == [[]]


def test_index_pq_rejects_indivisible_m():
    """dim % pq_m must fail at CONSTRUCTION: a first-ingest encode failure
    would land after tombstoning and wedge journal replay on the same
    entry forever (512-d CLIP index with pq_m=48, say)."""

    from mmrag_tpu.index.store import VectorIndex

    with pytest.raises(ValueError, match="not divisible"):
        VectorIndex(dim=512, dtype="pq", pq_m=48)
    VectorIndex(dim=512, dtype="pq", pq_m=32)  # 16/32/64 divide both dims


def test_index_pq_fused_failure_degrades_to_scan(rng, monkeypatch):
    """The runtime-failure ladder for the fused ADC kernel: a dispatch that
    fails at readback (the opaque INVALID_ARGUMENT class) retries on the
    scan path against the captured buffers and still answers."""

    from mmrag_tpu.index import store as store_mod
    from mmrag_tpu.index.store import VectorIndex

    ix = VectorIndex(dim=64, dtype="pq")
    rows, mat = _mk_rows(rng, 300)
    ix.upsert(rows)
    calls = {}
    orig = store_mod._pq_search_multi

    class _Boom:
        def __array__(self, *a, **kw):
            raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: injected")

    def failing(*args, **kw):
        impl = args[10] if len(args) > 10 else kw.get("impl", "")
        if impl != "scan" and "failed" not in calls:
            calls["failed"] = True
            return _Boom(), _Boom()
        calls["scan"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(store_mod, "_pq_search_multi", failing)
    hits = ix.search_batch(mat[:2], "u1", k=5)
    assert calls.get("failed") and calls.get("scan")
    assert hits[0] and hits[0][0][0] == "c0"


def test_index_pq_concurrent_upsert_search_compact(rng):
    """pq-mode race safety (mirror of the dense stress in
    test_index_store.py): the code slab's donated writes, host-slab
    rebinds on growth, codebook retrains, and the host refine all run
    under concurrent writers/readers/compaction without corruption."""

    import threading

    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage.records import VectorRow

    index = VectorIndex(dim=64, dtype="pq")
    vecs = _clustered(rng, n=64, d=64, centers=8)
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
    assert len(index) == 32
    for tid in range(4):
        hits = index.search(vecs[tid * 8], f"u{tid}", k=10)
        assert hits and all(c.startswith(f"t{tid}-") for c, _ in hits)


def test_engine_pq_mode_end_to_end(tmp_path):
    """TPU_INDEX_DTYPE=pq through the full engine: ingest -> retrieve works
    and snapshots persist (runs on the multi-device CPU mesh, so the engine
    row-shards the code slab and serves the shard_map ADC path)."""

    from mmrag_tpu.rag import index_build as ib
    from mmrag_tpu.rag.retrieve import retrieve
    from mmrag_tpu.storage import Document
    from tiny import tiny_engine

    # tiny towers: the subject is the pq index wiring, not encoder numerics
    # — full-size towers cost ~4 min of CPU compile here
    engine = tiny_engine(tmp_path, extra_env={
        "TPU_INDEX_DTYPE": "pq",
        "TPU_COMPILE_CACHE_DIR": "",
    })
    assert engine.text_index.is_pq and engine.image_index.is_pq
    engine.metadata.upsert_document(
        Document(document_id="d", user_id="u1", doc_type="pdf", title="T")
    )
    nodes = [
        {"text": f"passage {i} about renewable solar energy " * 8,
         "metadata": {"document_id": "d", "page": i}}
        for i in range(12)
    ]
    ib.index_text_nodes("u1", nodes, engine)
    res = retrieve("u1", "solar energy", engine=engine)
    assert res["results"] and res["text"]
    engine.persist_indexes()
    engine.close()


def test_ivf_pq_probe_scores_match_reference_formula(rng):
    """The probed-ADC scoring (bucket fetch + one-hot MXU rescore kernel,
    ops/ivf.py::_ivf_probe_pred_adc) and the spill path return EXACTLY the
    scores of the per-element bf16-table-lookup formula they replaced,
    with tenant/doc/live predicates honored and no better probed/spill
    candidate missed. Guards the kernel integration that took this path
    from 136 ms to 2 ms @1M (KERNELS.md §6)."""

    import jax

    from mmrag_tpu.ops import ivf as ivf_ops

    n, d, m = 4096, 64, 8
    rows = jnp.asarray(_clustered(rng, n=n, d=d, centers=16))
    books = pq.train_pq(rows, m=m, iters=4)
    codes = pq.pq_encode(rows, books)
    users = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    docs = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
    live = jnp.asarray(rng.random(n) > 0.1)
    cents, _ = ivf_ops.kmeans(rows, 8, iters=4)
    assign = np.asarray(ivf_ops._assign_with_structure(rows, cents)[0])
    layout = ivf_ops.build_ivf(
        codes, centroids=cents, assign=assign, structure_override=1.0,
        bucket_factor=0.5, users=users, docs=docs, live=live,
        pq_codebooks=books,
    )
    assert layout.spill.shape[0] > 0, "bucket_factor 0.5 must force a spill"

    q_n, k, nprobe = 5, 12, 4
    queries = rows[:q_n]
    uids_np = np.array([0, 1, 0, 1, 0], np.int32)
    dids_np = np.array([-1, -1, 2, 3, -1], np.int32)
    s, ids = ivf_ops.ivf_search_pred(
        layout, queries, jnp.asarray(uids_np), jnp.asarray(dids_np), k,
        nprobe=nprobe,
    )
    s, ids = np.asarray(s), np.asarray(ids)

    # reference: same probes (computed the same way, so they agree bit-for-
    # bit), then per-element lookups in the bf16 tables, f32-summed in
    # subvector order — the exact arithmetic both kernels perform
    tables = np.asarray(
        pq._adc_tables(queries, books).astype(jnp.bfloat16), np.float32
    )  # (m, K, q)
    probes = np.asarray(
        jax.lax.top_k(
            jnp.dot(queries, layout.centroids.T,
                    preferred_element_type=jnp.float32), nprobe
        )[1]
    )
    codes_np = np.asarray(codes).astype(np.int64) + 128
    users_np = np.asarray(users)
    docs_np = np.asarray(docs)
    live_np = np.asarray(live)
    b_ids = np.asarray(layout.bucket_ids)
    sp_ids = np.asarray(layout.spill_ids)

    def ref_score(row, qi):
        acc = np.float32(0.0)
        for j in range(m):
            acc = np.float32(acc + tables[j, codes_np[row, j], qi])
        return acc

    for qi in range(q_n):
        cand_rows = set(
            int(r) for c in probes[qi] for r in b_ids[c].ravel() if r >= 0
        ) | set(int(r) for r in sp_ids.ravel() if r >= 0)
        ref = {}
        for r in cand_rows:
            if not live_np[r] or users_np[r] != uids_np[qi]:
                continue
            if dids_np[qi] >= 0 and docs_np[r] != dids_np[qi]:
                continue
            ref[r] = ref_score(r, qi)
        returned = [(int(i), s[qi, c]) for c, i in enumerate(ids[qi])
                    if s[qi, c] > -1e29]
        for r, sc in returned:
            assert r in ref, f"q{qi}: returned row {r} not a valid candidate"
            assert sc == ref[r], f"q{qi} row {r}: {sc} != {ref[r]}"
        want = sorted(ref.values(), reverse=True)[:k]
        got = sorted((sc for _, sc in returned), reverse=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want[: len(got)])
        )
        assert len(returned) == min(k, len(ref))


def test_ivf_pq_residual_scores_match_reference_formula(rng):
    """Residual coding (ops/ivf.py pq_residual, the FAISS/LanceDB IVF_PQ
    convention): bucket/spill codes encode x - centroid[assign] and the
    returned score is EXACTLY (f32 centroid dot) + (bf16-table ADC sum),
    for probed and spilled rows alike."""

    import jax

    from mmrag_tpu.ops import ivf as ivf_ops

    n, d, m = 4096, 64, 8
    rows = jnp.asarray(_clustered(rng, n=n, d=d, centers=16))
    cents, _ = ivf_ops.kmeans(rows, 8, iters=4)
    assign = np.asarray(ivf_ops._assign_with_structure(rows, cents)[0])
    res = rows - jnp.take(cents, jnp.asarray(assign), axis=0)
    books = pq.train_pq(res, m=m, iters=4)
    codes = pq.pq_encode(res, books)
    users = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    live = jnp.asarray(rng.random(n) > 0.1)
    layout = ivf_ops.build_ivf(
        codes, centroids=cents, assign=assign, structure_override=1.0,
        bucket_factor=0.5, users=users, live=live,
        pq_codebooks=books, pq_residual=True,
    )
    assert layout.pq_residual and layout.spill.shape[0] > 0

    q_n, k, nprobe = 5, 12, 4
    queries = rows[:q_n]
    uids_np = np.array([0, 1, 0, 1, 0], np.int32)
    dids_np = np.full((q_n,), -1, np.int32)
    s, ids = ivf_ops.ivf_search_pred(
        layout, queries, jnp.asarray(uids_np), jnp.asarray(dids_np), k,
        nprobe=nprobe,
    )
    s, ids = np.asarray(s), np.asarray(ids)

    tables = np.asarray(
        pq._adc_tables(queries, books).astype(jnp.bfloat16), np.float32
    )  # (m, K, q)
    cscores_dev = jnp.dot(
        queries, layout.centroids.T, preferred_element_type=jnp.float32
    )
    probes = np.asarray(jax.lax.top_k(cscores_dev, nprobe)[1])
    cscores = np.asarray(cscores_dev)
    codes_np = np.asarray(codes).astype(np.int64) + 128
    users_np = np.asarray(users)
    live_np = np.asarray(live)
    b_ids = np.asarray(layout.bucket_ids)
    sp_ids = np.asarray(layout.spill_ids)
    assign_np = np.asarray(assign)

    def ref_score(row, qi):
        acc = np.float32(0.0)
        for j in range(m):
            acc = np.float32(acc + tables[j, codes_np[row, j], qi])
        # the residual offset is ONE f32 add of the device centroid dot
        return np.float32(acc + cscores[qi, assign_np[row]])

    for qi in range(q_n):
        cand_rows = set(
            int(r) for c in probes[qi] for r in b_ids[c].ravel() if r >= 0
        ) | set(int(r) for r in sp_ids.ravel() if r >= 0)
        ref = {}
        for r in cand_rows:
            if not live_np[r] or users_np[r] != uids_np[qi]:
                continue
            ref[r] = ref_score(r, qi)
        returned = [(int(i), s[qi, c]) for c, i in enumerate(ids[qi])
                    if s[qi, c] > -1e29]
        assert returned, f"q{qi}: no valid hits returned"
        for r, sc in returned:
            assert r in ref, f"q{qi}: returned row {r} not a valid candidate"
            assert sc == ref[r], f"q{qi} row {r}: {sc} != {ref[r]}"
        want = sorted(ref.values(), reverse=True)[:k]
        got = sorted((sc for _, sc in returned), reverse=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want[: len(got)])
        )


def test_ivf_pq_residual_improves_clustered_recall(rng):
    """PQ's documented worst case (KERNELS.md §6): tight clusters where
    within-cluster neighbors differ only by noise raw codes can't encode.
    Residual coding spends the codebooks' full resolution on exactly that
    noise, so the probed shortlist recovers the true neighbors."""

    from mmrag_tpu.ops import ivf as ivf_ops

    n, d, centers, m = 4096, 64, 48, 16
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    rows = c[rng.integers(0, centers, n)] + 0.07 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    q_n, k = 16, 10
    queries = rows[rng.integers(0, n, q_n)] + 0.02 * rng.standard_normal(
        (q_n, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    rows_j, q_j = jnp.asarray(rows), jnp.asarray(queries)
    cents, _ = ivf_ops.kmeans(rows_j, centers, iters=6)
    a_full = np.asarray(ivf_ops._assign_with_structure(rows_j, cents)[0])
    exact = queries @ rows.T
    thr = np.partition(exact, n - k, axis=1)[:, n - k] - 1e-3

    def refined_recall(residual):
        if residual:
            src = rows_j - jnp.take(cents, jnp.asarray(a_full), axis=0)
        else:
            src = rows_j
        books = pq.train_pq(src, m=m, iters=6)
        codes = pq.pq_encode(src, books)
        layout = ivf_ops.build_ivf(
            codes, centroids=cents, assign=a_full, structure_override=1.0,
            pq_codebooks=books, pq_residual=residual,
        )
        s, ids = ivf_ops.ivf_search_pred(
            layout, q_j, jnp.zeros((q_n,), jnp.int32),
            jnp.full((q_n,), -1, jnp.int32), 4 * k,
            nprobe=min(8, layout.n_clusters),
        )
        rs, _ = pq.refine_exact(queries, rows, np.asarray(ids),
                                np.asarray(s), k)
        return float(np.mean(rs >= thr[:, None]))

    raw = refined_recall(False)
    res = refined_recall(True)
    assert res >= raw, (raw, res)
    assert res >= 0.9, (raw, res)


def test_index_pq_ivf_residual_default_and_optout(rng):
    """The store's ivf+pq build residual-encodes by default (pq_residual
    ctor knob / TPU_PQ_RESIDUAL), and both forms serve correct refined
    results end-to-end."""

    from mmrag_tpu.index.store import VectorIndex

    rows, mat = _mk_rows(rng, 600)
    ix = VectorIndex(dim=64, dtype="pq", backend="ivf", ivf_min_rows=256)
    ix.ivf_build_async = False
    ix.upsert(rows)
    hits = ix.search_batch(mat[9:10], "u1", k=3)[0]
    assert ix._ivf is not None and ix._ivf.is_pq and ix._ivf.pq_residual
    assert hits and hits[0][0] == "c9" and hits[0][1] > 0.97

    raw = VectorIndex(dim=64, dtype="pq", backend="ivf", ivf_min_rows=256,
                      pq_residual=False)
    raw.ivf_build_async = False
    raw.upsert(rows)
    hits = raw.search_batch(mat[9:10], "u1", k=3)[0]
    assert raw._ivf is not None and not raw._ivf.pq_residual
    assert hits and hits[0][0] == "c9" and hits[0][1] > 0.97


# ---------------------------------------------------------------------------
# reconstruction-quality gate (VERDICT r2 item 3): poor geometry must not
# silently serve a collapsed ADC shortlist — demote to the exact int8 layout
# ---------------------------------------------------------------------------


def _uniform_rows(rng, n, d=384, user="u1", doc="d1", start=0):
    """Structureless rows on the d-sphere — at the production text dim (384,
    m=16 -> 24-d subvectors) PQ reconstruction collapses to ~0.67 cosine,
    the isotropic-noise geometry KERNELS.md §6 documents at refined recall
    0.08-0.26."""

    from mmrag_tpu.storage.records import VectorRow

    mat = rng.standard_normal((n, d)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return [
        VectorRow(chunk_id=f"c{start + i}", user_id=user, document_id=doc,
                  modality="text", embedding=mat[i])
        for i in range(n)
    ], mat


def test_pq_quality_gate_demotes_poor_geometry(rng):
    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.utils.profiling import metrics

    rows, mat = _uniform_rows(rng, 2048)
    before = metrics.summary()["counters"].get("index.pq.demoted", 0)
    ix = VectorIndex(dim=384, dtype="pq")
    ix.upsert(rows)
    # the first (re)train measured reconstruction below the gate: the index
    # is now the exact int8 layout, observable in /metrics
    assert not ix.is_pq
    assert ix._dtype_str == "int8" and ix._slab.dtype == jnp.int8
    assert ix._scales is not None and ix._pq is None
    after = metrics.summary()["counters"].get("index.pq.demoted", 0)
    assert after == before + 1

    # and it SERVES near-exactly (int8 scan ~0.98 top-k recall) — the whole
    # point of the gate: no silent 0.08-recall shortlist
    exact = VectorIndex(dim=384, dtype="float32", backend="xla")
    exact.upsert(rows)
    q = mat[:8] + 0.05 * rng.standard_normal((8, 384)).astype(np.float32)
    want = exact.search_batch(q, "u1", k=5)
    got = ix.search_batch(q, "u1", k=5)
    overlap = np.mean([
        len({c for c, _ in w} & {c for c, _ in g}) / 5.0
        for w, g in zip(want, got)
    ])
    assert overlap >= 0.8, overlap

    # appends keep flowing through the demoted (int8) path
    more, _ = _uniform_rows(rng, 64, start=2048)
    ix.upsert(more)
    assert len(ix) == 2112


def test_pq_quality_gate_zero_disables(rng):
    from mmrag_tpu.index.store import VectorIndex

    rows, mat = _uniform_rows(rng, 2048)
    ix = VectorIndex(dim=384, dtype="pq", pq_min_quality=0.0)
    ix.upsert(rows)
    assert ix.is_pq and ix._pq is not None  # operator override honored
    # refine still rescores exact cosines, so the top hit is right even here
    hits = ix.search_batch(mat[3:4], "u1", k=3)[0]
    assert hits and hits[0][0] == "c3"


def test_pq_quality_gate_benign_geometry_stays_pq(rng):
    from mmrag_tpu.index.store import VectorIndex

    # clustered low-noise rows (the encoder-corpus regime): reconstruction
    # ~0.9+, gate does not trip
    rows, mat = _mk_rows(rng, 512)
    ix = VectorIndex(dim=64, dtype="pq")
    ix.upsert(rows)
    assert ix.is_pq and ix._pq is not None


def test_pq_demoted_index_snapshot_roundtrip(tmp_path, rng):
    from mmrag_tpu.index.store import VectorIndex

    rows, mat = _uniform_rows(rng, 2048)
    ix = VectorIndex(dim=384, dtype="pq")
    ix.upsert(rows)
    assert not ix.is_pq
    ix.save(str(tmp_path), "t")
    # reload under the operator's pq setting: retrains on the dequantized
    # rows, trips the same gate, converges back to int8 — never serves a
    # collapsed pq shortlist in between
    back = VectorIndex.load(str(tmp_path), "t", dtype="pq")
    assert not back.is_pq and back._dtype_str == "int8"
    assert len(back) == 2048
    hits = back.search_batch(mat[7:8], "u1", k=3)[0]
    assert hits and hits[0][0] == "c7"
