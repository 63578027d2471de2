"""Multi-chip as the ENGINE's production mode (VERDICT r1 item 1).

These tests run on the 8-virtual-CPU-device mesh from conftest and assert the
engine-level contract: a RagEngine built with TPU_DATA_PARALLEL=auto (slab
row-sharded, encoder dispatches DP) produces the same ingest + retrieval
results as one built with TPU_DATA_PARALLEL=off — same chunk ids, same
scores — through the *public* engine API, not standalone parallel functions.
"""

import numpy as np
import pytest

import jax

from mmrag_tpu.index.store import VectorIndex
from mmrag_tpu.parallel.mesh import DATA_AXIS, build_mesh, engine_data_mesh
from mmrag_tpu.storage import Document
from mmrag_tpu.storage.records import VectorRow

from tiny import tiny_engine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _rows(rng, n, dim=64, user="u1", doc="d1", start=0):
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    return [
        VectorRow(
            chunk_id=f"{doc}-c{start + i}", user_id=user, document_id=doc,
            modality="text", embedding=mat[i],
        )
        for i in range(n)
    ]


def _clustered_rows(rng, n, dim=64, user="u1", doc="d1", start=0, centers=8):
    """Embedding-like geometry: passes the ivf structure gate."""

    cents = rng.standard_normal((centers, dim)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    which = rng.integers(0, centers, n)
    mat = cents[which] + 0.2 * rng.standard_normal((n, dim)).astype(np.float32)
    return [
        VectorRow(
            chunk_id=f"{doc}-c{start + i}", user_id=user, document_id=doc,
            modality="text", embedding=mat[i],
        )
        for i in range(n)
    ]


@pytest.fixture()
def mesh():
    return build_mesh(model_parallel=1)


class TestShardedVectorIndex:
    def test_matches_single_device(self, rng, mesh):
        single = VectorIndex(dim=64, dtype="float32")
        sharded = VectorIndex(dim=64, dtype="float32", mesh=mesh)
        rows = _rows(rng, 500) + _rows(rng, 300, user="u2", doc="d2")
        single.upsert(rows)
        sharded.upsert(rows)
        assert sharded._sharding is not None  # slab actually row-sharded

        queries = rng.standard_normal((4, 64)).astype(np.float32)
        for user, doc in [("u1", None), ("u2", "d2"), ("u1", "d2")]:
            a = single.search_batch(queries, user, k=10, document_id=doc)
            b = sharded.search_batch(queries, user, k=10, document_id=doc)
            for ha, hb in zip(a, b):
                assert [c for c, _ in ha] == [c for c, _ in hb]
                np.testing.assert_allclose(
                    [s for _, s in ha], [s for _, s in hb], rtol=1e-5
                )

    def test_multi_tenant_batched(self, rng, mesh):
        single = VectorIndex(dim=64, dtype="float32")
        sharded = VectorIndex(dim=64, dtype="float32", mesh=mesh)
        rows = _rows(rng, 200) + _rows(rng, 200, user="u2", doc="d2")
        single.upsert(rows)
        sharded.upsert(rows)
        queries = rng.standard_normal((6, 64)).astype(np.float32)
        users = ["u1", "u2", "u1", "u2", "nobody", "u1"]
        docs = [None, "d2", "d1", None, None, "d2"]
        a = single.search_batch_multi(queries, users, 8, docs)
        b = sharded.search_batch_multi(queries, users, 8, docs)
        for ha, hb in zip(a, b):
            assert [c for c, _ in ha] == [c for c, _ in hb]
        assert a[4] == [] and b[4] == []  # unknown tenant isolated
        assert a[5] == [] and b[5] == []  # u1 has no doc d2

    def test_int8_sharded(self, rng, mesh):
        single = VectorIndex(dim=64, dtype="int8")
        sharded = VectorIndex(dim=64, dtype="int8", mesh=mesh)
        rows = _rows(rng, 400)
        single.upsert(rows)
        sharded.upsert(rows)
        queries = rng.standard_normal((3, 64)).astype(np.float32)
        a = single.search_batch(queries, "u1", k=5)
        b = sharded.search_batch(queries, "u1", k=5)
        for ha, hb in zip(a, b):
            assert [c for c, _ in ha] == [c for c, _ in hb]
            np.testing.assert_allclose(
                [s for _, s in ha], [s for _, s in hb], rtol=1e-4
            )

    def test_tombstone_growth_compact_persist(self, rng, mesh, tmp_path):
        sharded = VectorIndex(dim=64, dtype="float32", mesh=mesh)
        sharded.upsert(_rows(rng, 100))
        sharded.upsert(_rows(rng, 5000, start=100))  # forces capacity growth
        assert sharded._capacity % mesh.shape[DATA_AXIS] == 0
        sharded.delete_document("d1")  # tombstones every row on the sharded live mask
        assert len(sharded) == 0
        rows = _rows(rng, 64, doc="d3")
        sharded.upsert(rows)
        sharded.compact()
        assert len(sharded) == 64
        sharded.save(str(tmp_path), "t")
        # reload in sharded mode and verify search still matches exact re-scan
        loaded = VectorIndex.load(str(tmp_path), "t", dtype="float32", mesh=mesh)
        q = rows[7].embedding[None, :] / np.linalg.norm(rows[7].embedding)
        hits = loaded.search_batch(q.astype(np.float32), "u1", k=1)
        assert hits[0][0][0] == "d3-c7"

    def test_ivf_composes_with_mesh(self, rng, mesh):
        """VERDICT r2 item 2: backend=ivf + mesh builds per-shard bucket
        layouts (parallel/sharded_ivf.py) instead of silently downgrading
        to the dense scan — and at nprobe >= C (every cluster probed, spill
        exact) the candidate set covers every row, so results bit-match the
        dense sharded scan."""

        from mmrag_tpu.parallel.sharded_ivf import ShardedIVFData

        rows = _clustered_rows(rng, 2000)
        idx = VectorIndex(dim=64, dtype="float32", backend="ivf", mesh=mesh,
                          ivf_min_rows=10, ivf_nprobe=10_000)
        idx.ivf_build_async = False
        idx.upsert(rows)
        dense = VectorIndex(dim=64, dtype="float32", mesh=mesh)
        dense.upsert(rows)
        q = rng.standard_normal((4, 64)).astype(np.float32)
        a = idx.search_batch(q, "u1", k=10)
        assert isinstance(idx._ivf, ShardedIVFData)
        assert idx._ivf.n_shards == mesh.shape[DATA_AXIS]
        b = dense.search_batch(q, "u1", k=10)
        for ha, hb in zip(a, b):
            assert [c for c, _ in ha] == [c for c, _ in hb]
            np.testing.assert_allclose(
                [s for _, s in ha], [s for _, s in hb], rtol=1e-5
            )

    def test_ivf_int8_composes_with_mesh(self, rng, mesh):
        from mmrag_tpu.parallel.sharded_ivf import ShardedIVFData

        rows = _clustered_rows(rng, 1500)
        idx = VectorIndex(dim=64, dtype="int8", backend="ivf", mesh=mesh,
                          ivf_min_rows=10, ivf_nprobe=10_000)
        idx.ivf_build_async = False
        idx.upsert(rows)
        dense = VectorIndex(dim=64, dtype="int8", mesh=mesh)
        dense.upsert(rows)
        q = rng.standard_normal((4, 64)).astype(np.float32)
        a = idx.search_batch(q, "u1", k=10)
        assert isinstance(idx._ivf, ShardedIVFData)
        assert idx._ivf.scales_b is not None
        b = dense.search_batch(q, "u1", k=10)
        for ha, hb in zip(a, b):
            assert [c for c, _ in ha] == [c for c, _ in hb]
            np.testing.assert_allclose(
                [s for _, s in ha], [s for _, s in hb], rtol=1e-4
            )

    def test_ivf_pq_composes_with_mesh(self, rng, mesh):
        """The partitioned-and-coded layout (residual ivf_pq) in its
        multi-chip form: probed ADC per shard + exact host refine."""

        from mmrag_tpu.parallel.sharded_ivf import ShardedIVFData

        rows = _clustered_rows(rng, 3000)
        mat = np.stack([r.embedding for r in rows])
        idx = VectorIndex(dim=64, dtype="pq", backend="ivf", mesh=mesh,
                          ivf_min_rows=10)
        idx.ivf_build_async = False
        idx.upsert(rows)
        exact = VectorIndex(dim=64, dtype="float32", mesh=mesh)
        exact.upsert(rows)
        q = (mat[:5] + 0.05 * rng.standard_normal((5, 64))).astype(np.float32)
        a = idx.search_batch(q, "u1", k=8)
        assert isinstance(idx._ivf, ShardedIVFData)
        assert idx._ivf.is_pq and idx._ivf.pq_residual
        b = exact.search_batch(q, "u1", k=8)
        overlap = np.mean([
            len({c for c, _ in ha} & {c for c, _ in hb}) / 8.0
            for ha, hb in zip(a, b)
        ])
        assert overlap >= 0.8, overlap

    def test_sharded_ivf_tail_and_tombstones(self, rng, mesh):
        """Rows appended after the build are exactly scored (tail scan) and
        tombstones propagate into the per-shard liveness planes."""

        rows = _clustered_rows(rng, 2000)
        idx = VectorIndex(dim=64, dtype="float32", backend="ivf", mesh=mesh,
                          ivf_min_rows=10, ivf_nprobe=10_000)
        idx.ivf_build_async = False
        idx.upsert(rows)
        idx.search_batch(rng.standard_normal((1, 64)).astype(np.float32),
                         "u1", k=1)  # trigger the build
        built = idx._ivf
        assert built is not None
        late = _rows(rng, 50, doc="d9", start=50_000)
        idx.upsert(late)
        assert idx._ivf is built  # small tail: no rebuild
        q = late[7].embedding[None, :] / np.linalg.norm(late[7].embedding)
        hits = idx.search_batch(q.astype(np.float32), "u1", k=1)
        assert hits[0][0][0] == "d9-c50007"
        idx.delete_document("d9")
        hits = idx.search_batch(q.astype(np.float32), "u1", k=3,
                                document_id="d9")
        assert hits[0] == []
        # clustered rows still served from the layout
        q0 = rows[3].embedding[None, :] / np.linalg.norm(rows[3].embedding)
        assert idx.search_batch(q0.astype(np.float32), "u1", k=1)[0][0][0] \
            == "d1-c3"

    def test_sharded_ivf_snapshot_warm_rebuild(self, rng, mesh, tmp_path):
        """A sharded index snapshot persists its global centroids; the
        restored index warm-rebuilds per-shard layouts with one assignment
        matmul (no Lloyd) and serves the same results."""

        from mmrag_tpu.parallel.sharded_ivf import ShardedIVFData

        rows = _clustered_rows(rng, 1200)
        idx = VectorIndex(dim=64, dtype="float32", backend="ivf", mesh=mesh,
                          ivf_min_rows=10, ivf_nprobe=10_000)
        idx.ivf_build_async = False
        idx.upsert(rows)
        q = rng.standard_normal((3, 64)).astype(np.float32)
        want = idx.search_batch(q, "u1", k=6)
        assert isinstance(idx._ivf, ShardedIVFData)
        idx.save(str(tmp_path), "t")
        back = VectorIndex.load(str(tmp_path), "t", dtype="float32",
                                backend="ivf", mesh=mesh, ivf_min_rows=10,
                                ivf_nprobe=10_000)
        back.ivf_build_async = False
        assert back._ivf_warm_centroids is not None
        got = back.search_batch(q, "u1", k=6)
        assert isinstance(back._ivf, ShardedIVFData)
        np.testing.assert_allclose(
            np.asarray(back._ivf.centroids), np.asarray(idx._ivf.centroids),
            atol=1e-6,
        )  # warm path: persisted centroids reused, not retrained
        for ha, hb in zip(want, got):
            assert [c for c, _ in ha] == [c for c, _ in hb]

    def test_sharded_ivf_structure_gate(self, rng, mesh):
        """Structureless data discards the sharded layout exactly like the
        single-chip gate; the dense sharded scan serves instead."""

        idx = VectorIndex(dim=64, dtype="float32", backend="ivf", mesh=mesh,
                          ivf_min_rows=10)
        idx.ivf_build_async = False
        idx.upsert(_rows(rng, 500))  # uniform rows: no cluster structure
        q = rng.standard_normal((2, 64)).astype(np.float32)
        hits = idx.search_batch(q, "u1", k=5)
        assert idx._ivf is None and idx._ivf_poor_at > 0
        assert all(len(h) == 5 for h in hits)


class TestEngineMultichip:
    """The VERDICT 'done' bar: a RagEngine-level ingest+chat on the virtual
    mesh matches the single-device engine."""

    @pytest.fixture()
    def engines(self, tmp_path):
        from mmrag_tpu.rag import index_build as ib

        nodes = [
            {
                "id": f"doc1-c{i}",
                "text": text,
                "metadata": {"document_id": "doc1", "page": i + 1},
            }
            for i, text in enumerate(
                [
                    "The mitochondria is the powerhouse of the cell.",
                    "Photosynthesis converts light energy into chemical energy.",
                    "Newton's laws of motion describe classical mechanics.",
                    "The Krebs cycle produces ATP in cellular respiration.",
                ]
            )
        ]
        built = []
        for name, dp in [("single", "off"), ("multi", "auto")]:
            eng = tiny_engine(tmp_path / name, {"TPU_DATA_PARALLEL": dp})
            eng.metadata.upsert_document(
                Document(document_id="doc1", user_id="u1", doc_type="pdf", title="T")
            )
            ib.index_text_nodes("u1", nodes, eng)
            built.append(eng)
        yield built
        for eng in built:
            eng.close()

    def test_mesh_active_only_in_auto(self, engines):
        single, multi = engines
        assert single.mesh is None and single.text_index._sharding is None
        assert multi.mesh is not None
        assert multi.text_index._sharding is not None
        assert multi.runtime.mesh is multi.mesh

    def test_retrieve_matches_single_device(self, engines):
        from mmrag_tpu.rag import retrieve as rv

        single, multi = engines
        for query in ["what powers the cell?", "laws of motion"]:
            a = rv.retrieve("u1", query, single)
            b = rv.retrieve("u1", query, multi)
            assert [h["chunk_id"] for h in a["results"]] == [
                h["chunk_id"] for h in b["results"]
            ]
            for ha, hb in zip(a["text"], b["text"]):
                assert ha["chunk_id"] == hb["chunk_id"]
                np.testing.assert_allclose(ha["score"], hb["score"], atol=1e-5)

    def test_dp_embeddings_match(self, engines):
        single, multi = engines
        texts = [f"sentence number {i} about biology" for i in range(11)]
        a = single.runtime.embed_text_batch(texts)
        b = multi.runtime.embed_text_batch(texts)
        np.testing.assert_allclose(a, b, atol=1e-5)
        qa = single.runtime.embed_queries_for_images(texts[:3])
        qb = multi.runtime.embed_queries_for_images(texts[:3])
        np.testing.assert_allclose(qa, qb, atol=1e-5)
        ra = single.runtime.rerank_scores("cell power", texts[:5])
        rb = multi.runtime.rerank_scores("cell power", texts[:5])
        np.testing.assert_allclose(ra, rb, atol=1e-4)

    def test_dp_image_embeddings_match(self, engines, rng):
        single, multi = engines
        imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(5)]
        a = single.runtime.embed_images_batch(imgs)
        b = multi.runtime.embed_images_batch(imgs)
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_everything_on_composition(tmp_path, monkeypatch):
    """The maximal production configuration in ONE engine: DP mesh +
    W8A8 encoders + PQ-coded index + ivf backend. Ingest through the real
    index_build path, then retrieve — the composition no single-feature
    test exercises. Guards against pairwise gates (e.g. the historical
    ivf+int8 raise) silently reappearing between any two of the four."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    from mmrag_tpu.rag import index_build as ib
    from mmrag_tpu.rag import retrieve as rv

    eng = tiny_engine(
        tmp_path / "all",
        {
            "TPU_DATA_PARALLEL": "auto",
            "TPU_ENCODER_QUANT": "int8",
            "TPU_INDEX_DTYPE": "pq",
            "TPU_TOPK_BACKEND": "ivf",
        },
    )
    try:
        assert eng.runtime.mesh is not None
        assert eng.runtime.encoder_quant == "int8"
        eng.metadata.upsert_document(
            Document(document_id="doc1", user_id="u1", doc_type="pdf", title="T")
        )
        nodes = [
            {
                "id": f"doc1-c{i}",
                "text": t,
                "metadata": {"document_id": "doc1", "page": i + 1},
            }
            for i, t in enumerate(
                [
                    "The mitochondria is the powerhouse of the cell.",
                    "Photosynthesis converts light energy into chemical energy.",
                    "Newton's laws of motion describe classical mechanics.",
                    "The Krebs cycle produces ATP in cellular respiration.",
                ]
            )
        ]
        ib.index_text_nodes("u1", nodes, eng)
        out = rv.retrieve("u1", "what powers the cell?", eng)
        assert out["results"], "composition returned no hits"
        assert all(h["chunk_id"].startswith("doc1-c") for h in out["text"])
    finally:
        eng.close()


def test_dp_encoder_quant(tmp_path, monkeypatch):
    """TPU_ENCODER_QUANT=int8 composes with DP: the q8 pytree rides the
    replicated-params spec through shard_map and the sharded engine matches
    the single-device quantized runtime within reduction-order tolerance."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    engines = []
    try:
        single = tiny_engine(
            tmp_path / "sq", {"TPU_DATA_PARALLEL": "off", "TPU_ENCODER_QUANT": "int8"}
        )
        engines.append(single)
        multi = tiny_engine(
            tmp_path / "mq", {"TPU_DATA_PARALLEL": "auto", "TPU_ENCODER_QUANT": "int8"}
        )
        engines.append(multi)
        assert multi.runtime.mesh is not None
        assert multi.runtime.encoder_quant == "int8"
        texts = [f"sentence number {i} about biology" for i in range(9)]
        a = single.runtime.embed_text_batch(texts)
        b = multi.runtime.embed_text_batch(texts)
        np.testing.assert_allclose(a, b, atol=1e-5)
        ra = single.runtime.rerank_scores("cell power", texts[:5])
        rb = multi.runtime.rerank_scores("cell power", texts[:5])
        np.testing.assert_allclose(ra, rb, atol=1e-4)
    finally:
        for eng in engines:
            eng.close()


def test_engine_data_mesh_settings(tmp_path):
    from mmrag_tpu.settings import load_settings

    n = len(jax.devices())
    cfg_auto = load_settings({"TPU_DATA_PARALLEL": "auto"})
    cfg_off = load_settings({"TPU_DATA_PARALLEL": "off"})
    cfg_two = load_settings({"TPU_DATA_PARALLEL": "2"})
    assert engine_data_mesh(cfg_off) is None
    mesh = engine_data_mesh(cfg_auto)
    assert mesh is not None and mesh.shape[DATA_AXIS] == n
    assert engine_data_mesh(cfg_two).shape[DATA_AXIS] == 2
    # cached: same device count -> same mesh object (shared jit caches)
    assert engine_data_mesh(cfg_auto) is mesh


def test_non_power_of_two_mesh(rng):
    """Capacity rounds up to a data-axis multiple on non-pow2 meshes (6 of
    the 8 virtual devices) and searches still match the exact scan."""

    if len(jax.devices()) < 6:
        pytest.skip("needs >=6 devices")
    mesh = build_mesh(n_devices=6, model_parallel=1)
    single = VectorIndex(dim=64, dtype="float32")
    sharded = VectorIndex(dim=64, dtype="float32", mesh=mesh)
    rows = _rows(rng, 300)
    single.upsert(rows)
    sharded.upsert(rows)
    assert sharded._capacity % 6 == 0
    queries = rng.standard_normal((3, 64)).astype(np.float32)
    a = single.search_batch(queries, "u1", k=7)
    b = sharded.search_batch(queries, "u1", k=7)
    for ha, hb in zip(a, b):
        assert [c for c, _ in ha] == [c for c, _ in hb]


def test_sharded_ivf_concurrent_mutation_stress(rng):
    """Race-safety of the r3 composition: ASYNC background sharded-IVF
    builds run while writers append, readers search, a deleter tombstones,
    and a compactor rebuilds — tenant isolation and liveness must hold at
    every observation, and the final state must reflect every write
    (the sharded analogue of test_index_store's concurrency stress)."""

    import threading

    mesh = build_mesh(model_parallel=1)
    index = VectorIndex(dim=64, dtype="float32", backend="ivf", mesh=mesh,
                        ivf_min_rows=32, ivf_nprobe=10_000)
    # async builds ON: the production mode — installs race real searches
    assert index.ivf_build_async
    cents = rng.standard_normal((8, 64)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    # np.random.Generator is NOT thread-safe: concurrent draws race on the
    # BitGenerator state — give every mutating thread its own spawned child
    thread_rngs = rng.spawn(5)

    def mk(tid, i, r):
        noise = r.standard_normal(64).astype(np.float32)
        emb = cents[(tid + i) % 8] + 0.2 * noise / np.linalg.norm(noise)
        return VectorRow(chunk_id=f"t{tid}-c{i}", user_id=f"u{tid}",
                         document_id=f"d{tid}", modality="text",
                         embedding=emb)

    errors = []

    def writer(tid):
        try:
            for i in range(40):
                index.upsert([mk(tid, i, thread_rngs[tid])])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    q = rng.standard_normal((2, 64)).astype(np.float32)

    def reader(tid):
        try:
            for _ in range(12):
                for hits in index.search_batch(q, f"u{tid % 3}", k=5):
                    for cid, _ in hits:
                        assert cid.startswith(f"t{tid % 3}-"), cid
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def deleter():
        try:
            index.upsert([mk(3, i, thread_rngs[3]) for i in range(16)])
            index.delete_document("d3")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def compactor():
        try:
            index.compact()
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = (
        [threading.Thread(target=writer, args=(t,)) for t in range(3)]
        + [threading.Thread(target=reader, args=(t,)) for t in range(3)]
        + [threading.Thread(target=deleter), threading.Thread(target=compactor)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(index) == 120  # 3 writers x 40; d3's 16 rows tombstoned
    # quiesce: force a final build and verify isolation + correctness on it
    index.ivf_build_async = False
    index.build_ivf()
    from mmrag_tpu.parallel.sharded_ivf import ShardedIVFData

    assert isinstance(index._ivf, ShardedIVFData)
    for tid in range(3):
        hits = index.search_batch(q, f"u{tid}", k=8)[0]
        assert hits and all(c.startswith(f"t{tid}-") for c, _ in hits)
    assert index.search_batch(q, "u3", k=5)[0] == []  # deleted tenant
