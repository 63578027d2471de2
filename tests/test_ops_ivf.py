"""IVF ANN: k-means layout invariants, recall vs exact search, spill/tail
exactness, tenant-mask isolation, and the VectorIndex ivf backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from mmrag_tpu.ops import ivf as ivf_ops
from mmrag_tpu.ops.topk import cosine_topk, l2_normalize
from mmrag_tpu.storage.records import VectorRow


def _corpus(rng, n, d=64):
    return np.asarray(
        l2_normalize(jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)))
    )


def test_kmeans_layout_covers_every_row(rng):
    rows = jnp.asarray(_corpus(rng, 2000))
    ivf = ivf_ops.build_ivf(rows, n_clusters=16, bucket_factor=1.5)
    placed = np.asarray(ivf.bucket_ids).reshape(-1)
    spilled = np.asarray(ivf.spill_ids)
    all_ids = np.concatenate([placed[placed >= 0], spilled[spilled >= 0]])
    assert sorted(all_ids.tolist()) == list(range(2000))  # every row, exactly once
    assert ivf.centroids.shape == (16, 64)


def _clustered_corpus(rng, n, d=64, centers=48, sigma=0.15):
    """Mixture-of-gaussians: the data regime IVF is for (embedding spaces
    cluster; uniform random gaussian is the structureless worst case where
    any partitioning scheme degrades toward nprobe/C recall)."""

    mu = rng.standard_normal((centers, d))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    pts = mu[rng.integers(0, centers, n)] + sigma * rng.standard_normal((n, d))
    return np.asarray(l2_normalize(jnp.asarray(pts.astype(np.float32))))


def test_ivf_recall_vs_exact(rng):
    rows = jnp.asarray(_clustered_corpus(rng, 8192))
    ivf = ivf_ops.build_ivf(rows, n_clusters=64, bucket_factor=1.5)
    queries = rows[:16] + 0.01 * jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    queries = l2_normalize(queries)
    mask = jnp.ones((8192,), bool)
    k = 10
    es, ei = cosine_topk(queries, rows, mask, k)
    as_, ai = ivf_ops.ivf_search(ivf, queries, mask, k, nprobe=16)
    recall = np.mean([
        len(set(np.asarray(ei)[q]) & set(np.asarray(ai)[q])) / k for q in range(16)
    ])
    assert recall >= 0.9, f"recall {recall}"
    # probing every cluster must be exact
    fs, fi = ivf_ops.ivf_search(ivf, queries, mask, k, nprobe=64)
    np.testing.assert_array_equal(np.sort(np.asarray(fi)), np.sort(np.asarray(ei)))


def test_ivf_respects_row_mask(rng):
    rows = jnp.asarray(_corpus(rng, 1024))
    ivf = ivf_ops.build_ivf(rows, n_clusters=8)
    queries = rows[:4]
    mask = jnp.asarray(np.arange(1024) % 2 == 0)  # only even rows allowed
    _, idx = ivf_ops.ivf_search(ivf, queries, mask, 8, nprobe=8)
    assert (np.asarray(idx) % 2 == 0).all()
    # per-query 2-D masks
    mask2 = jnp.stack([mask, ~mask, mask, ~mask])
    _, idx2 = ivf_ops.ivf_search(ivf, queries, mask2, 8, nprobe=8)
    idx2 = np.asarray(idx2)
    assert (idx2[0] % 2 == 0).all() and (idx2[1] % 2 == 1).all()


def test_ivf_small_cluster_count_spills_exactly(rng):
    """Tiny buckets force heavy spill; full-probe search must stay exact."""

    rows = jnp.asarray(_corpus(rng, 512))
    ivf = ivf_ops.build_ivf(rows, n_clusters=4, bucket_factor=0.25)
    assert ivf.spill.shape[0] > 0
    queries = rows[:3]
    mask = jnp.ones((512,), bool)
    es, ei = cosine_topk(queries, rows, mask, 5)
    as_, ai = ivf_ops.ivf_search(ivf, queries, mask, 5, nprobe=4)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))


def test_pallas_probe_kernel_matches_gather(rng):
    """Scalar-prefetch probe kernel (interpret mode on CPU) == XLA gather,
    including the in-kernel tenant/doc/live predicate."""

    C, B, d, nprobe, qn = 16, 128, 128, 4, 3
    buckets = jnp.asarray(rng.standard_normal((C, B, d)).astype(np.float32))
    bucket_ids = jnp.asarray(
        rng.permutation(C * B).reshape(C, 1, B).astype(np.int32))
    users_b = jnp.asarray(rng.integers(0, 3, (C, 1, B)).astype(np.int32))
    docs_b = jnp.asarray(rng.integers(0, 5, (C, 1, B)).astype(np.int32))
    live_b = jnp.asarray((rng.random((C, 1, B)) > 0.2).astype(np.int32))
    queries = jnp.asarray(l2_normalize(
        jnp.asarray(rng.standard_normal((qn, d)).astype(np.float32))))
    probes = jnp.asarray(rng.integers(0, C, (qn, nprobe)).astype(np.int32))
    uids = jnp.asarray([0, 1, 2], jnp.int32)
    dids = jnp.asarray([-1, 2, -1], jnp.int32)

    s, ids = ivf_ops.pallas_probe_scores(
        queries, buckets, bucket_ids, users_b, docs_b, live_b,
        probes, uids, dids, interpret=True)
    p = np.asarray(probes)
    raw = np.stack([
        np.asarray(buckets)[p[q]].reshape(-1, d) @ np.asarray(queries)[q]
        for q in range(qn)
    ]).reshape(qn, nprobe, B)
    for q in range(qn):
        valid = (
            (np.asarray(live_b)[p[q], 0] != 0)
            & (np.asarray(users_b)[p[q], 0] == int(uids[q]))
            & ((int(dids[q]) < 0) | (np.asarray(docs_b)[p[q], 0] == int(dids[q])))
        )
        want = np.where(valid, raw[q], -1e30)
        np.testing.assert_allclose(np.asarray(s)[q], want, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(ids)[q], np.asarray(bucket_ids)[p[q], 0])

    # generic-mask path still produces valid shapes
    mask = jnp.asarray(rng.random(C * B) > 0.3)
    cent = jnp.asarray(rng.standard_normal((C, d)).astype(np.float32))
    s1, i1 = ivf_ops._ivf_probe(queries, cent, buckets, bucket_ids, mask, 5, nprobe)
    assert s1.shape == (qn, 5) and i1.shape == (qn, 5)


def test_ivf_search_pred_matches_row_mask_path(rng):
    """Predicated search == generic row-mask search for tenant/doc masks,
    including after tombstones flow in via mark_dead."""

    rows_np = _clustered_corpus(rng, 2048)
    users = rng.integers(0, 3, 2048).astype(np.int32)
    docs = rng.integers(0, 4, 2048).astype(np.int32)
    live = np.ones(2048, np.int32)
    ivf = ivf_ops.build_ivf(
        jnp.asarray(rows_np), n_clusters=16, bucket_factor=1.0,
        users=jnp.asarray(users), docs=jnp.asarray(docs), live=jnp.asarray(live),
    )
    dead = rng.choice(2048, 100, replace=False)
    ivf.mark_dead(dead)
    live[dead] = 0

    queries = jnp.asarray(l2_normalize(jnp.asarray(
        rows_np[:4] + 0.01 * rng.standard_normal((4, 64)).astype(np.float32))))
    uids = jnp.asarray([0, 1, 2, 0], jnp.int32)
    dids = jnp.asarray([-1, 1, -1, 3], jnp.int32)
    mask2d = jnp.asarray(
        (live != 0)[None]
        & (users[None] == np.asarray(uids)[:, None])
        & ((np.asarray(dids)[:, None] < 0) | (docs[None] == np.asarray(dids)[:, None]))
    )
    sp, ip = ivf_ops.ivf_search_pred(ivf, queries, uids, dids, 8, nprobe=16)
    sm, im = ivf_ops.ivf_search(ivf, queries, mask2d, 8, nprobe=16)
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(im))
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sm), atol=1e-5)
    # no dead or wrong-tenant row survives
    ip = np.asarray(ip)
    for q in range(4):
        for row in ip[q][ip[q] >= 0]:
            assert live[row] == 1 and users[row] == int(uids[q])


def _rows(mat, user="u1", doc="d1", prefix="c"):
    return [
        VectorRow(chunk_id=f"{prefix}{i}", user_id=user, document_id=doc,
                  modality="text", embedding=v)
        for i, v in enumerate(np.asarray(mat))
    ]


def test_vector_index_ivf_backend_end_to_end(rng, monkeypatch):
    from mmrag_tpu.index.store import VectorIndex

    mat = _corpus(rng, 600)
    idx = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=256,
                      ivf_min_structure=0)  # uniform test data: gate off
    idx.ivf_build_async = False  # deterministic builds for the test
    idx.ivf_nprobe = 64
    idx.upsert(_rows(mat))
    hits = idx.search(mat[7], "u1", k=3)
    assert hits and hits[0][0] == "c7" and hits[0][1] > 0.99
    assert idx._ivf is not None  # lazy build happened

    # append tail after the build: new rows must be findable (exact tail path)
    tail_mat = _corpus(np.random.default_rng(7), 40)
    idx.upsert(_rows(tail_mat, prefix="t"))
    hits = idx.search(tail_mat[11], "u1", k=3)
    assert hits and hits[0][0] == "t11"

    # tenant isolation through the ivf path
    other = _corpus(np.random.default_rng(8), 32)
    idx.upsert(_rows(other, user="u2", doc="d9", prefix="o"))
    hits = idx.search(other[0], "u1", k=5)
    assert all(not c.startswith("o") for c, _ in hits)
    hits = idx.search(other[0], "u2", k=5)
    assert hits and hits[0][0] == "o0"

    # delete-then-add upsert tombstones reach the ivf path via the live mask
    idx.upsert(_rows(mat[:1] * 0 + _corpus(np.random.default_rng(9), 1), prefix="c"))
    hits = idx.search(mat[0], "u1", k=1)
    assert hits[0][0] != "c0" or hits[0][1] < 0.99


def test_vector_index_ivf_background_build(rng):
    """Async mode: searches serve the dense path until the background build
    installs, then switch — and results agree either way."""

    import time

    from mmrag_tpu.index.store import VectorIndex

    idx = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=128,
                      ivf_min_structure=0)
    mat = _corpus(rng, 300)
    idx.upsert(_rows(mat))
    dense_hits = idx.search(mat[5], "u1", k=3)  # triggers the background build
    # generous wait: the background kmeans can take >5 s on a contended CPU
    # (observed flaking under 4-way pytest-xdist)
    for _ in range(1200):
        if idx._ivf is not None and not idx._ivf_building:
            break
        time.sleep(0.05)
    assert idx._ivf is not None, "background build never installed"
    ivf_hits = idx.search(mat[5], "u1", k=3)
    assert dense_hits[0][0] == ivf_hits[0][0] == "c5"


def test_vector_index_ivf_runtime_fallback_to_dense(rng, monkeypatch):
    """A runtime failure in the IVF dispatch degrades to the dense path
    (same contract as _search_with_fallback) instead of failing the query."""

    import jax

    from mmrag_tpu.index.store import VectorIndex

    idx = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=64,
                      ivf_min_structure=0)
    idx.ivf_build_async = False
    mat = _corpus(rng, 200)
    idx.upsert(_rows(mat))
    assert idx.search(mat[3], "u1", k=1)[0][0] == "c3"  # ivf path works
    assert idx._ivf is not None

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: TPU backend error")

    monkeypatch.setattr(idx, "_ivf_search_inner", boom)
    hits = idx.search(mat[3], "u1", k=1)
    assert hits and hits[0][0] == "c3"  # dense fallback answered
    hits = idx.search_batch_multi(mat[:2], ["u1", "u1"], k=1)
    assert hits[0][0][0] == "c0" and hits[1][0][0] == "c1"


def _clustered(rng, n, d=64, centers=24, noise=0.25):
    """Embedding-like geometry: k-means-friendly clusters on the sphere."""

    c = rng.standard_normal((centers, d))
    asg = rng.integers(0, centers, n)
    mat = c[asg] + noise * rng.standard_normal((n, d))
    return np.asarray(l2_normalize(jnp.asarray(mat.astype(np.float32))))


def test_build_ivf_int8_layout(rng):
    """ivf + int8 composition (the reference's IVF_PQ role): quantized
    buckets + per-slot scales; search matches the dense int8 scan."""

    from mmrag_tpu.ops.topk import _cosine_topk_int8, quantize_rows_int8

    mat = _clustered(rng, 800)
    q8, scales = quantize_rows_int8(jnp.asarray(mat))
    ivf = ivf_ops.build_ivf(q8, n_clusters=16, scales=scales)
    assert ivf.scales_b is not None and ivf.buckets.dtype == jnp.int8
    assert ivf.structure > 2 * ivf_ops.structureless_baseline(16, 64)

    queries = jnp.asarray(mat[:8])
    uids = jnp.zeros(8, jnp.int32)
    dids = jnp.full(8, -1, jnp.int32)
    s, ids = ivf_ops.ivf_search_pred(ivf, queries, uids, dids, 10, nprobe=16)
    mask = jnp.ones((800,), bool)
    es, eids = _cosine_topk_int8(queries, q8, scales, mask, 10)
    # probing every cluster == exact: ids and scores agree with the dense scan
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(eids))
    np.testing.assert_allclose(np.asarray(s), np.asarray(es), rtol=1e-5)


def test_build_ivf_int8_recall_with_partial_probe(rng):
    from mmrag_tpu.ops.topk import quantize_rows_int8

    mat = _clustered(rng, 2000)
    q8, scales = quantize_rows_int8(jnp.asarray(mat))
    ivf = ivf_ops.build_ivf(q8, n_clusters=32, scales=scales)
    queries = jnp.asarray(mat[100:116])
    uids = jnp.zeros(16, jnp.int32)
    dids = jnp.full(16, -1, jnp.int32)
    s, ids = ivf_ops.ivf_search_pred(ivf, queries, uids, dids, 10, nprobe=8)
    mask = jnp.ones((2000,), bool)
    _, eids = cosine_topk(queries, jnp.asarray(mat), mask, 10, "xla")
    hit = np.mean([
        len(set(np.asarray(ids)[i]) & set(np.asarray(eids)[i])) / 10
        for i in range(16)
    ])
    assert hit >= 0.9, f"recall@10 {hit} too low on clustered data"


def test_vector_index_ivf_int8_composes(rng):
    """TPU_TOPK_BACKEND=ivf + TPU_INDEX_DTYPE=int8 no longer raises: the
    layout holds quantized rows and searches answer through it."""

    from mmrag_tpu.index.store import VectorIndex

    mat = _clustered(rng, 600)
    idx = VectorIndex(dim=64, dtype="int8", backend="ivf", ivf_min_rows=256)
    idx.ivf_build_async = False
    idx.upsert(_rows(mat))
    hits = idx.search(mat[7], "u1", k=3)
    assert idx._ivf is not None and idx._ivf.scales_b is not None
    assert hits and hits[0][0] == "c7" and hits[0][1] > 0.97

    # append tail scored via the quantized exact path and merged consistently
    tail = _clustered(np.random.default_rng(5), 48)
    idx.upsert(_rows(tail, prefix="t"))
    hits = idx.search(tail[11], "u1", k=3)
    assert hits and hits[0][0] == "t11"

    # tenant isolation through the quantized probe kernel path
    other = _clustered(np.random.default_rng(6), 32)
    idx.upsert(_rows(other, user="u2", doc="d9", prefix="o"))
    assert all(not c.startswith("o") for c, _ in idx.search(other[0], "u1", k=5))


def test_structure_gate_discards_structureless_layout(rng):
    """Uniform-random rows (the structureless worst case): the layout is
    judged unclusterable, discarded, and searches stay exact-dense; the
    rebuild backs off until the corpus doubles (VERDICT r1 item 7)."""

    from mmrag_tpu.index.store import VectorIndex

    idx = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=64)
    idx.ivf_build_async = False
    # enough rows that k-means cannot memorize (at tiny n every layout looks
    # "structured"; the empirical ratio is ~1.16 at n=2000/d=64 vs 1.5 gate)
    mat = _corpus(rng, 2000)
    idx.upsert(_rows(mat))
    hits = idx.search(mat[3], "u1", k=1)  # triggers build -> gate discards
    assert idx._ivf is None and idx._ivf_poor_at == 2000
    assert hits[0][0] == "c3"  # exact dense path answered
    # no rebuild churn below 2x rows
    idx.search(mat[4], "u1", k=1)
    assert idx._ivf_poor_at == 2000

    # clustered data passes the gate
    idx2 = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=64)
    idx2.ivf_build_async = False
    idx2.upsert(_rows(_clustered(rng, 300)))
    idx2.search(mat[0], "u1", k=1)
    assert idx2._ivf is not None and idx2._ivf_poor_at == 0


def test_vector_index_ivf_rebuild_on_large_tail(rng):
    from mmrag_tpu.index.store import VectorIndex

    idx = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=128,
                      ivf_min_structure=0)
    idx.ivf_build_async = False
    mat = _corpus(rng, 256)
    idx.upsert(_rows(mat))
    idx.search(mat[0], "u1", k=1)
    first_built = idx._ivf.built_rows
    big_tail = _corpus(np.random.default_rng(3), 5000)
    idx.upsert(_rows(big_tail, prefix="b"))
    idx.search(mat[0], "u1", k=1)  # tail > built/2 triggers rebuild
    assert idx._ivf.built_rows > first_built


def test_ivf_on_encoder_generated_embeddings(tmp_path):
    """VERDICT r1 weak #2: recall measured on actual encoder OUTPUTS (tiny
    runtime, real tokenize->embed path), not synthetic clusters — encoder
    geometry passes the structure gate and probes recover the exact top-10."""

    import itertools

    from mmrag_tpu.models.bert import BertConfig
    from mmrag_tpu.models.clip import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
    from mmrag_tpu.models.runtime import EncoderRuntime
    from mmrag_tpu.settings import load_settings

    cfg = load_settings({
        "WEIGHTS_DIR": str(tmp_path / "w"), "TPU_COMPUTE_DTYPE": "float32",
        "TPU_TEXT_BATCH_BUCKETS": "256", "TPU_TEXT_SEQ_BUCKETS": "32",
        "TPU_DATA_PARALLEL": "off",
    })
    rt = EncoderRuntime(
        cfg,
        bert_cfg=BertConfig(hidden_size=64, num_layers=2, num_heads=4,
                            intermediate_size=128),
        clip_cfg=CLIPConfig(
            vision=CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=2,
                                    intermediate_size=64),
            text=CLIPTextConfig(hidden_size=32, num_layers=1, num_heads=2,
                                intermediate_size=64),
            projection_dim=64,
        ),
    )
    subjects = ["mitochondria", "photosynthesis", "newton", "ocean", "neural",
                "quantum", "empire", "volcano"]
    verbs = ["explains", "produces", "models", "shapes", "powers"]
    objs = ["energy", "sugar", "mechanics", "climate", "patterns", "trade"]
    combos = itertools.cycle(itertools.product(subjects, verbs, objs))
    texts = [f"the {s} {v} the {o} in chapter {i % 37}"
             for i, (s, v, o) in enumerate(itertools.islice(combos, 2000))]
    emb = jnp.asarray(rt.embed_text_batch(texts), jnp.float32)
    ivf = ivf_ops.build_ivf(emb)
    ratio = ivf.structure / ivf_ops.structureless_baseline(ivf.n_clusters, 64)
    assert ratio > 1.5, f"encoder embeddings judged structureless ({ratio:.2f})"

    qtexts = [t.replace("in chapter", "within chapter") for t in texts[:8]]
    q = jnp.asarray(rt.embed_text_batch(qtexts), jnp.float32)
    mask = jnp.ones((2000,), bool)
    _, ei = cosine_topk(q, emb, mask, 10, "xla")
    _, ai = ivf_ops.ivf_search_pred(
        ivf, q, jnp.zeros(8, jnp.int32), jnp.full(8, -1, jnp.int32),
        10, nprobe=min(16, ivf.n_clusters))
    ei, ai = np.asarray(ei), np.asarray(ai)
    recall = np.mean([len(set(ei[i]) & set(ai[i])) / 10 for i in range(8)])
    assert recall >= 0.95, f"recall@10 {recall} on encoder embeddings"


def test_ivf_centroids_persist_for_warm_rebuild(rng, tmp_path):
    """Snapshots carry the IVF centroids; the restored index's first build
    skips Lloyd (warm rebuild) and produces the same probe results."""

    from mmrag_tpu.index.store import VectorIndex

    mat = _clustered(rng, 600)
    idx = VectorIndex(dim=64, dtype="float32", backend="ivf", ivf_min_rows=64)
    idx.ivf_build_async = False
    idx.upsert(_rows(mat))
    idx.search(mat[0], "u1", k=1)  # builds the layout
    assert idx._ivf is not None
    idx.save(str(tmp_path), "t")

    loaded = VectorIndex.load(str(tmp_path), "t", dtype="float32", backend="ivf",
                              ivf_min_rows=64)
    loaded.ivf_build_async = False
    assert loaded._ivf_warm_centroids is not None
    np.testing.assert_allclose(
        loaded._ivf_warm_centroids, np.asarray(idx._ivf.centroids), rtol=1e-6
    )
    hits = loaded.search(mat[9], "u1", k=3)  # first search warm-rebuilds
    assert loaded._ivf is not None
    assert loaded._ivf_warm_centroids is None  # one-shot consumed
    np.testing.assert_allclose(
        np.asarray(loaded._ivf.centroids), np.asarray(idx._ivf.centroids),
        rtol=1e-6,
    )
    assert hits and hits[0][0] == "c9"


def test_build_ivf_pq_layout(rng):
    """The literal IVF_PQ (partitioned AND product-quantized): buckets hold
    m-byte ADC codes, clustering comes precomputed from the f32 originals,
    and probing every cluster reproduces the flat ADC scan's scores (same
    bf16 tables — probe, spill, and flat paths share one scale)."""

    from mmrag_tpu.ops import pq as pqops

    mat = _clustered(rng, 800)
    rows = jnp.asarray(mat)
    books = pqops.train_pq(rows, m=8, iters=4)
    codes = pqops.pq_encode(rows, books)
    cents, assign = ivf_ops.kmeans(rows, 16, iters=4, train_sample=0)
    _, structure = ivf_ops._assign_with_structure(rows, cents)
    ivf = ivf_ops.build_ivf(
        codes, n_clusters=16, centroids=cents, assign=np.asarray(assign),
        structure_override=float(structure), pq_codebooks=books,
    )
    assert ivf.is_pq and ivf.buckets.dtype == jnp.int8
    assert ivf.buckets.shape[2] == 8  # m bytes per slot
    assert ivf.structure == pytest.approx(float(structure))

    queries = jnp.asarray(mat[:8])
    uids = jnp.zeros(8, jnp.int32)
    dids = jnp.full(8, -1, jnp.int32)
    s, ids = ivf_ops.ivf_search_pred(ivf, queries, uids, dids, 10, nprobe=16)
    es, eids = pqops._pq_topk_scan(
        queries, books, codes, jnp.ones((800,), bool), 10
    )
    s, ids, es, eids = map(np.asarray, (s, ids, es, eids))
    # full probing covers every row (buckets + spill): identical ADC scores
    np.testing.assert_allclose(s, es, atol=1e-6)
    assert (ids[:, 0] == eids[:, 0]).all()  # distinct maxima agree exactly


def test_build_ivf_pq_partial_probe_and_predicates(rng):
    """Partial probing keeps >= 0.9 of the flat ADC's top-10 on clustered
    data, and tenant/doc predicates + tombstones hold in the coded layout."""

    from mmrag_tpu.ops import pq as pqops

    mat = _clustered(rng, 2000)
    rows = jnp.asarray(mat)
    books = pqops.train_pq(rows, m=8, iters=4)
    codes = pqops.pq_encode(rows, books)
    cents, assign = ivf_ops.kmeans(rows, 32, iters=4, train_sample=0)
    users = np.zeros(2000, np.int32)
    users[1000:] = 7  # second tenant
    ivf = ivf_ops.build_ivf(
        codes, n_clusters=32, centroids=cents, assign=np.asarray(assign),
        structure_override=1.0, pq_codebooks=books,
        users=jnp.asarray(users),
    )
    queries = jnp.asarray(mat[100:116])
    uids = jnp.zeros(16, jnp.int32)
    dids = jnp.full(16, -1, jnp.int32)
    _, ids = ivf_ops.ivf_search_pred(ivf, queries, uids, dids, 10, nprobe=8)
    mask = np.zeros((2000,), bool)
    mask[:1000] = True  # tenant 0's rows
    _, fids = pqops._pq_topk_scan(queries, books, codes, jnp.asarray(mask), 10)
    ids, fids = np.asarray(ids), np.asarray(fids)
    assert (ids < 1000).all()  # tenant isolation in the coded layout
    hit = np.mean([
        len(set(ids[i]) & set(fids[i])) / 10 for i in range(16)
    ])
    assert hit >= 0.9, f"probed-vs-flat overlap {hit} too low"

    # tombstones flow into the coded layout
    ivf.mark_dead(np.arange(0, 1000))
    s2, ids2 = ivf_ops.ivf_search_pred(ivf, queries, uids, dids, 10, nprobe=32)
    assert (np.asarray(s2) <= -1e29).all()  # tenant 0 fully tombstoned


def test_kmeans_train_sample_spans_insertion_order(rng):
    """The train subsample must stride the WHOLE corpus (ceil stride), not a
    first-rows prefix: insertion order is per-tenant, so a floor stride (1
    whenever train_sample < n < 2*train_sample) would fit centroids only to
    early tenants and late tenants' geometry would go unseen."""

    d = 32
    # rows 0..199: cluster near +e0; rows 200..299: a LATE tenant near +e1
    early = np.zeros((200, d), np.float32)
    early[:, 0] = 1.0
    late = np.zeros((100, d), np.float32)
    late[:, 1] = 1.0
    rows = np.concatenate([early, late]) + 0.05 * rng.standard_normal(
        (300, d)
    ).astype(np.float32)
    rows = np.asarray(l2_normalize(jnp.asarray(rows)))
    # train_sample=200 < n=300 < 2*train_sample: the floor-stride regression
    cents, assign = ivf_ops.kmeans(
        jnp.asarray(rows), n_clusters=4, iters=6, train_sample=200
    )
    # some centroid must sit on the late tenant's direction (e1)
    assert float(jnp.max(cents[:, 1])) > 0.8
    # and the late rows must not share a bucket with the early ones
    a = np.asarray(assign)
    assert set(a[:200].tolist()).isdisjoint(set(a[200:].tolist()))


def test_even_indices_full_sample_past_cap():
    """Sampling just past the cap must keep the FULL sample size (a ceil
    stride halved it: n=cap+1 -> stride 2 -> ~cap/2 rows) while still
    spanning the whole insertion order."""

    for n, cap in ((201, 200), (300, 200), (399, 200), (1000, 10)):
        sel = ivf_ops._even_indices(n, cap)
        assert sel.shape == (cap,)
        assert sel[0] == 0 and sel[-1] == n - 1
        assert len(np.unique(sel)) == cap  # spacing >= 1 -> distinct
