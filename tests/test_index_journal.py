"""Cross-process index replication (the api/Celery-worker split).

The reference's api and worker both write the same on-disk LanceDB tables,
so worker-side ingest is immediately visible to api-side retrieval
(``/root/reference/app/tasks.py:120-150``). Our HBM-slab index gets the same
semantics from the mutation journal (``mmrag_tpu/index/journal.py``): these
tests run two VectorIndex/RagEngine replicas over one shared journal —
exactly what two processes sharing an index dir look like — and assert
convergence, persist-safety, and gap recovery.
"""

import numpy as np
import pytest

from mmrag_tpu.index.journal import IndexJournal
from mmrag_tpu.index.store import VectorIndex
from mmrag_tpu.storage.records import VectorRow

from tiny import tiny_engine


def _rows(rng, n, dim=64, user="u1", doc="d1", start=0):
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    return [
        VectorRow(
            chunk_id=f"{doc}-c{start + i}", user_id=user, document_id=doc,
            modality="text", embedding=mat[i],
        )
        for i in range(n)
    ]


def _pair(tmp_path, dtype="float32", window_sec=3600.0):
    """Two index replicas over one journal, like api + worker processes."""

    journal = IndexJournal(
        str(tmp_path / "journal.db"), compact_window_sec=window_sec
    )
    a = VectorIndex(dim=64, dtype=dtype)
    b = VectorIndex(dim=64, dtype=dtype)
    for idx in (a, b):
        idx.attach_journal(
            journal, "text_collection", str(tmp_path), "text_collection",
            poll_sec=0.0,  # replay on every search: deterministic tests
        )
    return journal, a, b


class TestJournalReplication:
    def test_upsert_visible_across_replicas(self, rng, tmp_path):
        _, a, b = _pair(tmp_path)
        rows = _rows(rng, 20)
        assert a.upsert(rows) == 20
        q = rows[3].embedding[None, :]
        hits = b.search_batch(q, "u1", k=1)[0]
        assert hits and hits[0][0] == "d1-c3"
        assert len(b) == 20

    def test_total_order_convergence(self, rng, tmp_path):
        """Interleaved writes from both replicas converge to one state."""

        _, a, b = _pair(tmp_path)
        a.upsert(_rows(rng, 10))
        b.upsert(_rows(rng, 10, doc="d2", start=100))
        a.delete_document("d2")
        b.upsert(_rows(rng, 5, doc="d3", start=200))
        q = rng.standard_normal((1, 64)).astype(np.float32)
        ha = a.search_batch(q, "u1", k=30)[0]
        hb = b.search_batch(q, "u1", k=30)[0]
        assert [c for c, _ in ha] == [c for c, _ in hb]
        assert len(ha) == 15  # d2 deleted everywhere
        assert not any(c.startswith("d2") for c, _ in ha)

    def test_same_chunk_last_writer_wins(self, rng, tmp_path):
        _, a, b = _pair(tmp_path)
        v1 = _rows(rng, 1)
        v2 = [
            VectorRow(
                chunk_id="d1-c0", user_id="u1", document_id="d1",
                modality="text",
                embedding=rng.standard_normal(64).astype(np.float32),
            )
        ]
        a.upsert(v1)
        b.upsert(v2)  # journaled after a's entry -> wins on both
        for idx in (a, b):
            hits = idx.search_batch(
                v2[0].embedding[None, :], "u1", k=1
            )[0]
            assert hits[0][0] == "d1-c0"
            assert hits[0][1] > 0.999  # v2's embedding, not v1's
            assert len(idx) == 1

    def test_persist_includes_peer_rows(self, rng, tmp_path):
        """The api persisting cannot clobber worker-ingested vectors: save
        replays to the journal tip first (the round-1 critical finding)."""

        journal, a, b = _pair(tmp_path)
        a.upsert(_rows(rng, 8))
        b.upsert(_rows(rng, 8, doc="d2", start=50))
        # "api" (a) saves without ever having searched: must still include
        # the "worker"'s (b) d2 rows
        a.save(str(tmp_path), "text_collection")
        fresh = VectorIndex.load(str(tmp_path), "text_collection", "float32")
        assert len(fresh) == 16
        assert fresh._loaded_snapshot_seq == 2

    def test_fresh_boot_snapshot_plus_tail(self, rng, tmp_path):
        journal, a, b = _pair(tmp_path)
        a.upsert(_rows(rng, 8))
        a.save(str(tmp_path), "text_collection")
        b.upsert(_rows(rng, 4, doc="d2", start=50))  # after the snapshot
        c = VectorIndex.load(str(tmp_path), "text_collection", "float32")
        c.attach_journal(
            journal, "text_collection", str(tmp_path), "text_collection",
            poll_sec=0.0,
        )
        assert len(c) == 12  # snapshot rows + tail replay

    def test_gap_recovery_reloads_snapshot(self, rng, tmp_path):
        """A replica whose cursor was compacted away reloads the snapshot
        instead of silently missing rows."""

        journal, a, b = _pair(tmp_path, window_sec=0.0)  # compact instantly
        a.upsert(_rows(rng, 8))
        a.upsert(_rows(rng, 4, doc="d2", start=50))
        # b never replayed; a saves and compacts the whole log away
        a.save(str(tmp_path), "text_collection")
        assert journal.compacted_upto("text_collection") == 2
        assert journal.max_seq("text_collection") == 0
        q = rng.standard_normal((1, 64)).astype(np.float32)
        hits = b.search_batch(q, "u1", k=20)[0]
        assert len(hits) == 12  # recovered everything from the snapshot

    def test_int8_replicas_converge_bit_exact(self, rng, tmp_path):
        _, a, b = _pair(tmp_path, dtype="int8")
        a.upsert(_rows(rng, 32))
        q = rng.standard_normal((2, 64)).astype(np.float32)
        ha = a.search_batch(q, "u1", k=10)
        hb = b.search_batch(q, "u1", k=10)
        for ra, rb in zip(ha, hb):
            assert ra == rb  # identical quantization -> identical scores

    def test_pq_replicas_converge(self, rng, tmp_path):
        """pq-mode replicas (api/worker split): both processes replay the
        same journaled rows in the same order, codebook training is
        deterministic, so codes, shortlists, and refined scores all
        converge."""

        _, a, b = _pair(tmp_path, dtype="pq")
        a.upsert(_rows(rng, 48))
        q = rng.standard_normal((2, 64)).astype(np.float32)
        ha = a.search_batch(q, "u1", k=10)
        hb = b.search_batch(q, "u1", k=10)  # replay happens on search
        for ra, rb in zip(ha, hb):
            assert ra == rb  # identical codes + identical host originals
        assert b._pq is not None and b._size == 48
        np.testing.assert_array_equal(
            np.asarray(a._pq.codebooks), np.asarray(b._pq.codebooks)
        )

    def test_rejected_upsert_not_journaled(self, rng, tmp_path):
        journal, a, b = _pair(tmp_path)
        bad = [
            VectorRow(
                chunk_id="x", user_id="u1", document_id="d1", modality="text",
                embedding=np.zeros(32, np.float32),  # wrong dim
            )
        ]
        with pytest.raises(ValueError):
            a.upsert(bad)
        assert journal.max_seq("text_collection") == 0  # peers never see it


class TestEngineSplit:
    def test_worker_ingest_visible_to_api_engine(self, rng, tmp_path):
        """Two engines over one index dir (the compose api/worker split):
        rows ingested through one are retrievable through the other, and
        either side's persist keeps both sides' rows."""

        env = {"TPU_JOURNAL_POLL_SEC": "0"}
        api = tiny_engine(tmp_path, env)
        worker = tiny_engine(tmp_path, env)
        rows = _rows(rng, 6, dim=api.runtime.text_dim)
        worker.text_index.upsert(rows)

        q = rows[0].embedding[None, :].astype(np.float32)
        hits = api.text_index.search_batch(q, "u1", k=1)[0]
        assert hits and hits[0][0] == "d1-c0"

        # api persists while holding no private writes: worker rows survive
        api.persist_indexes()
        fresh = tiny_engine(tmp_path, env)
        assert len(fresh.text_index) == 6
        for e in (api, worker, fresh):
            e.close()
