"""RagEngine: the process-wide wiring of encoders, indexes, and catalogs.

The reference wires its pipeline through import-time module singletons
(``/root/reference/app/ml/retrieve.py:21-22``, ``app/ml/index_build.py:14-16``,
``api/routes.py:35-36``); here the same roles live on one injectable object so
tests construct isolated engines and the serving layer shares one instance.

Owns:
  * :class:`EncoderRuntime`            — MiniLM / CLIP / cross-encoder (L1)
  * two :class:`VectorIndex` instances — text (384-d) + image (512-d) slabs,
    the reference's two LanceDB collections (``lancedb_store.py:30-31``)
  * :class:`MetadataStore`             — documents/chunks catalog (SQLite)
  * :class:`NoteStore`                 — notes/quizzes
  * :class:`IndexVersionStore`         — per-user version counters (cache keys)
"""

from __future__ import annotations

import os
import threading
from typing import Optional

from ..index.store import VectorIndex
from ..index.version import IndexVersionStore
from ..models.runtime import EncoderRuntime, get_runtime
from ..settings import Settings, settings as _default_settings
from ..storage.metadata import MetadataStore
from ..storage.notes import NoteStore


class RagEngine:
    def __init__(
        self,
        cfg: Optional[Settings] = None,
        runtime: Optional[EncoderRuntime] = None,
    ) -> None:
        self.cfg = cfg or _default_settings
        self.runtime = runtime or get_runtime(self.cfg)
        paths = self.cfg.paths
        os.makedirs(paths.index_dir, exist_ok=True)
        # multi-chip engine mode: with >1 device (and TPU_DATA_PARALLEL not
        # "off") both index slabs are row-sharded over the data axis and
        # every search runs the shard_map local-topk + all_gather merge; the
        # runtime computed the same mesh for its DP encoder dispatches
        self.mesh = getattr(self.runtime, "mesh", None)  # stubs lack a mesh
        # index storage dtype is its own knob: TPU_INDEX_DTYPE=int8 must not
        # downgrade the encoders' compute dtype (review finding)
        index_dtype = self.cfg.tpu.index_dtype or self.cfg.tpu.compute_dtype
        self.text_index = VectorIndex.load_or_create(
            paths.index_dir, "text_collection",
            dim=self.runtime.text_dim, dtype=index_dtype,
            backend=self.cfg.tpu.topk_backend,
            ivf_nprobe=self.cfg.tpu.ivf_nprobe,
            ivf_min_rows=self.cfg.tpu.ivf_min_rows,
            ivf_min_structure=self.cfg.tpu.ivf_min_structure,
            mesh=self.mesh,
            pq_m=self.cfg.tpu.pq_m, pq_refine=self.cfg.tpu.pq_refine,
            pq_residual=self.cfg.tpu.pq_residual,
            pq_min_quality=self.cfg.tpu.pq_min_quality,
        )
        self.image_index = VectorIndex.load_or_create(
            paths.index_dir, "image_collection",
            dim=self.runtime.clip_dim, dtype=index_dtype,
            backend=self.cfg.tpu.topk_backend,
            ivf_nprobe=self.cfg.tpu.ivf_nprobe,
            ivf_min_rows=self.cfg.tpu.ivf_min_rows,
            ivf_min_structure=self.cfg.tpu.ivf_min_structure,
            mesh=self.mesh,
            pq_m=self.cfg.tpu.pq_m, pq_refine=self.cfg.tpu.pq_refine,
            pq_residual=self.cfg.tpu.pq_residual,
            pq_min_quality=self.cfg.tpu.pq_min_quality,
        )
        # cross-process replication (reference api/Celery-worker split): both
        # processes journal index mutations into one SQLite log and replay
        # each other's entries, so a worker-side ingest is visible to api
        # retrieval within journal_poll_sec and neither process's persist can
        # clobber the other's rows (the reference gets this for free from
        # shared on-disk LanceDB tables, lancedb_store.py:29-41)
        self.journal = None
        if self.cfg.tpu.index_journal:
            from ..index.journal import IndexJournal

            self.journal = IndexJournal(
                os.path.join(paths.index_dir, "index_journal.db")
            )
            self.text_index.attach_journal(
                self.journal, "text_collection", paths.index_dir,
                "text_collection", poll_sec=self.cfg.tpu.journal_poll_sec,
            )
            self.image_index.attach_journal(
                self.journal, "image_collection", paths.index_dir,
                "image_collection", poll_sec=self.cfg.tpu.journal_poll_sec,
            )
        self.metadata = MetadataStore(
            os.path.join(paths.index_dir, "metadata.db")
        )
        self.notes = NoteStore(paths.notes_db_path)
        self.versions = IndexVersionStore(
            os.path.join(paths.index_dir, "index_versions.db")
        )
        self._persist_lock = threading.Lock()
        self._query_batcher = None
        self._retrieval_batcher = None
        self._batcher_lock = threading.Lock()

    @property
    def query_batcher(self):
        """Lazy cross-request query-embed coalescer (None when disabled via
        ``TPU_MICROBATCH_WINDOW_MS=0``)."""

        if self.cfg.tpu.microbatch_window_ms <= 0:
            return None
        with self._batcher_lock:
            if self._query_batcher is None:
                from ..serving.batcher import QueryEmbedBatcher

                self._query_batcher = QueryEmbedBatcher(
                    self.runtime,
                    max_batch=self.cfg.tpu.microbatch_max,
                    window_ms=self.cfg.tpu.microbatch_window_ms,
                )
            return self._query_batcher

    def warmup_serving(self, max_coalesce: Optional[int] = None,
                       stop: Optional[threading.Event] = None) -> int:
        """Pre-compile the serving query-path executables for every coalesce
        bucket the MicroBatcher can produce (embed text/image towers, masked
        top-k per modality, cross-encoder rerank), so concurrent load never
        pays a first-compile inside a request. The warmup tenant is a
        never-interned sentinel, so no real rows are scanned into results.
        Returns the number of warm dispatches issued. Skipped shapes (empty
        index) compile lazily on first data as before.

        ``stop``: checked between buckets — a shutting-down server sets it
        and joins the warmup thread, so interpreter teardown never lands
        while a warmup dispatch is inside XLA (which aborts the process the
        same way an orphaned ivf-build thread did, index/store.py)."""

        max_coalesce = max_coalesce or self.cfg.tpu.microbatch_max
        cfgr = self.cfg.retrieval
        # a mid-length passage so the rerank warms a realistic seq bucket
        passage = "warmup passage text for the cross encoder. " * 8
        count = 0
        # EVERY coalesce length 1..max, through the LIVE serving pipeline
        # (embed_queries_device -> async device-padded searches -> rerank).
        # Two lessons from the r4 warm-window compile guard are baked in:
        # (1) partial-length result slices and the device-side jnp.pad are
        # shape-specialized per EXACT length, so warming only the bucket
        # boundaries leaves every odd coalesce paying 50-400 ms of
        # implicit-jit compiles mid-request; (2) the live path hands DEVICE
        # arrays to the index (store._pad_queries pads on device), so a
        # numpy-array warmup compiles the wrong executable and warms
        # nothing. The big bucket executables still compile once each —
        # the per-length sweep only adds the tiny pad/slice jits.
        warmed_rerank: set = set()
        for n in range(1, max_coalesce + 1):
            if stop is not None and stop.is_set():
                return count
            qs = [f"warmup query {i} of {n}" for i in range(n)]
            tdev, idev = self.runtime.embed_queries_device(qs)
            count += 1
            users = ["\x00warmup"] * n
            for index, k, qdev in (
                (self.text_index, cfgr.index_topk_text, tdev),
                (self.image_index, cfgr.index_topk_image, idev),
            ):
                if index._size > 0:  # empty index never dispatches
                    index.search_batch_multi_async(qdev, users, k)()
                    count += 1
            if cfgr.use_rerank:
                # rerank_pairs buckets pair counts internally, so most
                # lengths re-hit an already-compiled executable — only run
                # the cross-encoder when this length's bucket decomposition
                # introduces a new padded batch size (advisor r4)
                n_pairs = n * cfgr.rerank_topk
                buckets = set(self.runtime.rerank_bucket_sizes(n_pairs))
                if not buckets <= warmed_rerank:
                    self.runtime.rerank_pairs(
                        ["warmup query"] * n_pairs, [passage] * n_pairs
                    )
                    warmed_rerank |= buckets
                    count += 1
        return count

    def persist_indexes(self) -> None:
        """Flush both vector indexes to disk (restart survival, like the
        reference's on-disk LanceDB tables)."""

        with self._persist_lock:
            self.text_index.save(self.cfg.paths.index_dir, "text_collection")
            self.image_index.save(self.cfg.paths.index_dir, "image_collection")

    @property
    def retrieval_batcher(self):
        """Lazy whole-request retrieval coalescer: N concurrent ``retrieve``
        calls share one embed + one masked top-k per modality + one rerank
        dispatch (None when disabled via ``TPU_MICROBATCH_WINDOW_MS=0``)."""

        if self.cfg.tpu.microbatch_window_ms <= 0:
            return None
        with self._batcher_lock:
            if self._retrieval_batcher is None:
                from ..serving.batcher import MicroBatcher

                def run(items):
                    from .retrieve import retrieve_batch

                    return retrieve_batch(list(items), self)

                self._retrieval_batcher = MicroBatcher(
                    run,
                    max_batch=self.cfg.tpu.microbatch_max,
                    window_ms=self.cfg.tpu.microbatch_window_ms,
                    name="retrieval",
                    workers=self.cfg.tpu.microbatch_workers,
                )
            return self._retrieval_batcher

    def close(self) -> None:
        if self._retrieval_batcher is not None:
            self._retrieval_batcher.close()
        if self._query_batcher is not None:
            self._query_batcher.close()
        self.metadata.close()
        self.notes.close()
        self.versions.close()
        if self.journal is not None:
            self.journal.close()


_engine: Optional[RagEngine] = None
_engine_lock = threading.Lock()


def get_engine(cfg: Optional[Settings] = None) -> RagEngine:
    global _engine
    with _engine_lock:
        if _engine is None:
            _engine = RagEngine(cfg)
    return _engine


def set_engine(engine: Optional[RagEngine]) -> None:
    """Test/serving hook to install (or clear) the process engine."""

    global _engine
    with _engine_lock:
        _engine = engine
