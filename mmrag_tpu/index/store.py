"""Device-resident vector index: HBM slabs + fused masked top-k search.

Replaces the reference's LanceDB tables + IVF_PQ ANN
(``/root/reference/app/storage/lancedb_store.py:29-139``) with an exact,
TPU-native design:

  * One :class:`VectorIndex` per modality (``text``/``image``), like the
    reference's two collections (``lancedb_store.py:30-31``).
  * Embeddings live in a device slab of static shape ``(capacity, dim)``
    (bf16 by default). Capacity grows geometrically, so XLA compiles one
    search executable per capacity tier, not per append (SURVEY §7 hard
    part (c)).
  * Appends are ``dynamic_update_slice`` with donated buffers — in-place HBM
    updates, no re-upload of the slab.
  * Tenant/document predicates are *exact* int32 ids from host-side interning
    tables (no hash collisions -> no cross-tenant leakage) and are pushed
    into the scoring mask on device — the reference's post-fusion
    ``video_id`` filter bug (``api/routes.py:272-279``) cannot occur.
  * Upsert keeps the reference's delete-then-add semantics
    (``lancedb_store.py:87-101``): existing chunk_ids are tombstoned, new
    rows appended; compaction reclaims tombstones.
  * Persistence: compacted ``.npz`` + JSON manifest per index directory,
    surviving restarts like the reference's on-disk LanceDB.

Normalization happens on write (``lancedb_store.py:63-69``), so search is a
pure dot product = cosine.
"""

from __future__ import annotations

import atexit
import functools
import json
import logging
import os
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..ops.topk import (
    cosine_topk,
    predicate_mask as _predicate_mask,
    predicate_mask_multi as _predicate_mask_multi,
    quantize_rows_int8,
)
from ..storage.records import VectorRow

_MIN_CAPACITY = 4096
_QUERY_BUCKETS = (1, 2, 4, 8, 16, 32)
_logger = logging.getLogger(__name__)


# In-flight background ivf-build threads. They are daemon threads (a build
# must never block a clean exit indefinitely), but a daemon thread killed by
# interpreter teardown while inside an XLA dispatch aborts the whole process
# ("FATAL: exception not rethrown" — pthread cancellation mid-C++-unwind), so
# atexit joins them first. atexit runs before CPython kills daemon threads;
# builds are seconds-scale, the timeout bounds a pathological one.
_ivf_builds: "set[threading.Thread]" = set()
_ivf_builds_lock = threading.Lock()


def _join_ivf_builds(timeout: float = 120.0) -> None:
    with _ivf_builds_lock:
        pending = list(_ivf_builds)
    for t in pending:
        t.join(timeout)
        if t.is_alive():
            _logger.warning("ivf build %s still running at exit", t.name)


atexit.register(_join_ivf_builds)


def _query_bucket(q: int) -> int:
    """Round a coalesced query count up to a bucket so any micro-batch size
    reuses one compiled search executable per bucket (the batch-dim analogue
    of the encoder runtime's ``TPU_TEXT_BATCH_BUCKETS``)."""

    for b in _QUERY_BUCKETS:
        if q <= b:
            return b
    return -(-q // _QUERY_BUCKETS[-1]) * _QUERY_BUCKETS[-1]


def _readback_pair(scores, idx) -> Tuple[np.ndarray, np.ndarray]:
    """Materialize (scores f32 (q, k), idx i32 (q, k)) in ONE device→host
    transfer: the scores bitcast into int32 lanes and ride home prepended
    to the id matrix, split + bitcast back on host. Two ``np.asarray``
    calls pay the relay's ~29 ms round-trip twice per search. The packed
    array is INTEGER on purpose — the opposite packing (ids as f32 lanes)
    measurably corrupts ids whose bit patterns are signalling NaNs (the
    transfer path quiets them); integer lanes round-trip every bit, and
    f32 scores are any-bits-in/same-bits-out under int transport. np
    inputs and test doubles pass through to plain materialization, and
    the packed form raises the same JaxRuntimeError at readback, so every
    fallback guard works unchanged."""

    if not (isinstance(scores, jax.Array) and isinstance(idx, jax.Array)):
        return np.asarray(scores), np.asarray(idx)
    packed = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                scores.astype(jnp.float32), jnp.int32
            ),
            idx.astype(jnp.int32),
        ],
        axis=-1,
    )
    ph = np.asarray(packed)
    kc = scores.shape[-1]
    return np.ascontiguousarray(ph[..., :kc]).view(np.float32), ph[..., kc:]


def _pad_queries(queries) -> np.ndarray:
    """Zero-pad the query batch to its bucket; pad rows are sliced off after
    the dispatch (and in the multi-tenant path carry the never-matching
    tenant sentinel, so they cannot surface hits). Device arrays pad on
    device — the async serving path hands embeds over without a host sync."""

    q = queries.shape[0]
    b = _query_bucket(q)
    if b == q:
        return queries
    if isinstance(queries, jax.Array):
        return jnp.pad(queries, ((0, b - q), (0, 0)))
    pad = np.zeros((b - q, queries.shape[1]), queries.dtype)
    return np.concatenate([queries, pad])


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(slab: jnp.ndarray, update: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(slab, update.astype(slab.dtype), (start, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_ids(vec: jnp.ndarray, update: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(vec, update, (start,))


@functools.partial(jax.jit, static_argnames=("k",))
def _search_multi_int8(
    slab, scales, users, docs, live, queries, user_ids, doc_ids, k
):
    from ..ops.topk import _cosine_topk_int8

    mask = _predicate_mask_multi(users, docs, live, user_ids, doc_ids)
    return _cosine_topk_int8(queries, slab, scales, mask, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _search_int8(slab, scales, users, docs, live, queries, user_id, doc_id, k):
    from ..ops.topk import _cosine_topk_int8

    mask = _predicate_mask(users, docs, live, user_id, doc_id)
    return _cosine_topk_int8(queries, slab, scales, mask, k)


@functools.partial(jax.jit, static_argnames=("k", "backend"))
def _search_multi(
    slab: jnp.ndarray,
    users: jnp.ndarray,
    docs: jnp.ndarray,
    live: jnp.ndarray,
    queries: jnp.ndarray,  # (q, d)
    user_ids: jnp.ndarray,  # (q,) interned tenant per query (-2 = unknown)
    doc_ids: jnp.ndarray,  # (q,) -1 = no document filter
    k: int,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mask = _predicate_mask_multi(users, docs, live, user_ids, doc_ids)
    return cosine_topk(queries, slab, mask, k, backend)


@functools.partial(jax.jit, static_argnames=("k", "impl"))
def _pq_search_multi(
    codebooks: jnp.ndarray,  # (m, K, ds) f32
    codes: jnp.ndarray,  # (capacity, m) int8
    users: jnp.ndarray,
    docs: jnp.ndarray,
    live: jnp.ndarray,
    queries: jnp.ndarray,
    user_ids: jnp.ndarray,
    doc_ids: jnp.ndarray,
    k: int,
    impl: str = "",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from ..ops.pq import pq_topk

    mask = _predicate_mask_multi(users, docs, live, user_ids, doc_ids)
    return pq_topk(queries, codebooks, codes, mask, k, impl)


@functools.partial(jax.jit, static_argnames=("k", "backend"))
def _search(
    slab: jnp.ndarray,
    users: jnp.ndarray,
    docs: jnp.ndarray,
    live: jnp.ndarray,
    queries: jnp.ndarray,
    user_id: jnp.ndarray,
    doc_id: jnp.ndarray,  # -1 = no document filter
    k: int,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mask = _predicate_mask(users, docs, live, user_id, doc_id)
    return cosine_topk(queries, slab, mask, k, backend)


class VectorIndex:
    """A growable device-resident embedding index for one modality."""

    _DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": jnp.int8}

    def __init__(self, dim: int, dtype: str = "bfloat16", backend: str = "auto",
                 ivf_nprobe: Optional[int] = None,
                 ivf_min_rows: Optional[int] = None,
                 ivf_min_structure: Optional[float] = None,
                 mesh=None, pq_m: Optional[int] = None,
                 pq_refine: Optional[int] = None,
                 pq_residual: Optional[bool] = None,
                 pq_min_quality: Optional[float] = None) -> None:
        self.dim = dim
        # Multi-chip production mode (SURVEY §2c "LanceDB internal ANN
        # threading" row, lancedb_store.py:103-123): with a mesh, the slab and
        # its predicate columns live row-sharded over the `data` axis and every
        # search routes through the shard_map local-topk + all_gather merge
        # (parallel/sharded_index.py). Single-device behavior is unchanged.
        self.mesh = mesh
        self._sharding = None
        self._n_data = 1
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS, row_sharded

            n_data = mesh.shape[DATA_AXIS]
            if n_data > 1:
                self._sharding = row_sharded(mesh)
                self._n_data = n_data
        self._shard_fn_cache: Dict = {}
        # dtype "pq": product-quantized mode (ops/pq.py, the reference's
        # IVF_PQ num_sub_vectors=16 role) — the DEVICE slab holds m-byte
        # codes (48x less HBM than bf16), the f32 originals stay in host RAM
        # for snapshots and the exact refine pass. Snapshot payloads use the
        # bf16-bits form, so self.dtype stays bfloat16.
        self.is_pq = dtype == "pq"
        self.pq_m = 16 if pq_m is None else int(pq_m)
        self.pq_refine = 16 if pq_refine is None else int(pq_refine)
        # ivf+pq composition: encode bucket codes as residuals vs their
        # cluster centroid (the FAISS/LanceDB IVF_PQ convention) — the
        # codebooks spend their resolution on within-cluster geometry, the
        # part raw coding blurs. Scoring adds the query-centroid dot back
        # (ops/ivf.py). Default on; TPU_PQ_RESIDUAL=0 restores raw coding.
        self.pq_residual = True if pq_residual is None else bool(pq_residual)
        # reconstruction-quality gate (VERDICT r2 item 3, the pq analogue of
        # ivf_min_structure): a (re)train whose mean reconstruction cosine
        # falls below this demotes the index to the exact int8 layout —
        # adversarial isotropic-noise geometry measures ~0.57, encoder
        # corpora ~0.99, so 0.8 splits them cleanly. 0 disables.
        self.pq_min_quality = (
            0.8 if pq_min_quality is None else float(pq_min_quality)
        )
        if self.is_pq and dim % self.pq_m:
            # fail at construction, not first ingest: _apply_upsert validates
            # before tombstoning, and a mid-replay encode failure would wedge
            # the journal on the same entry forever. The engine applies one
            # TPU_PQ_M to both indexes, so it must divide 384 AND 512
            # (16/32/64/128 do).
            raise ValueError(
                f"pq index dim {dim} not divisible by pq_m={self.pq_m}"
            )
        self._pq = None  # ops.pq.PQData once trained
        self._pq_trained_at = 0  # rows at last codebook (re)train
        self._host_slab: Optional[np.ndarray] = (
            np.zeros((0, dim), np.float32) if self.is_pq else None
        )
        self.dtype = (
            jnp.bfloat16 if self.is_pq else self._DTYPES.get(dtype, jnp.float32)
        )
        # backend "ivf" = k-means partitioned ANN (ops/ivf.py, the reference's
        # LanceDB IVF role): built lazily once the index is large enough,
        # probed clusters + exact spill/tail, dense scoring below threshold
        self.use_ivf = backend == "ivf"
        if self.use_ivf:
            backend = "auto"
        if self.is_pq and backend not in ("auto", "xla"):
            raise ValueError(
                f"pq index supports backend auto/xla, not {backend!r} "
                "(ADC scoring replaces the dense kernels)"
            )
        if self.dtype == jnp.int8 and backend not in ("auto", "xla"):
            raise ValueError(
                f"int8 index supports backend auto/xla, not {backend!r} "
                "(the pallas/approx paths score bf16/f32 slabs)"
            )
        self.backend = backend  # cosine_topk backend: auto|xla|pallas|approx
        # knobs normally flow in from settings (TPU_IVF_NPROBE/TPU_IVF_MIN_ROWS
        # via the typed loader); constructor defaults serve direct use
        self.ivf_nprobe = 64 if ivf_nprobe is None else int(ivf_nprobe)
        self.ivf_min_rows = 65536 if ivf_min_rows is None else int(ivf_min_rows)
        # clusterability gate (VERDICT r1 item 7): a built layout whose mean
        # assignment cosine is below min_structure x the structureless
        # baseline is discarded — probing buys no recall on such data, so the
        # exact dense path serves instead. 0 disables the gate.
        self.ivf_min_structure = (
            1.5 if ivf_min_structure is None else float(ivf_min_structure)
        )
        self._ivf = None  # ops.ivf.IVFData once built
        self._ivf_building = False  # a background (re)build is in flight
        self._ivf_poor_at = 0  # rows when structure was judged poor (backoff)
        # persisted centroids (snapshot restore): the first build after a
        # load skips Lloyd and only runs the assignment matmul
        self._ivf_warm_centroids: Optional[np.ndarray] = None
        self.ivf_build_async = True  # tests set False for determinism
        self._generation = 0  # bumped by compact(); aborts stale installs
        self._scales: Optional[jnp.ndarray] = None  # (capacity,) f32, int8 mode
        self._lock = threading.RLock()
        self._capacity = 0
        self._size = 0  # rows appended (including tombstones)
        self._slab: Optional[jnp.ndarray] = None
        self._users: Optional[jnp.ndarray] = None
        self._docs: Optional[jnp.ndarray] = None
        self._live: Optional[jnp.ndarray] = None
        # host-side row metadata, parallel to slab rows
        self._chunk_ids: List[str] = []
        self._row_user: List[str] = []
        self._row_doc: List[str] = []
        self._row_live: np.ndarray = np.zeros(0, dtype=bool)
        self._chunk_to_row: Dict[str, int] = {}
        # exact interning tables (no hash collisions)
        self._user_intern: Dict[str, int] = {}
        self._doc_intern: Dict[str, int] = {}
        self._dtype_str = (
            dtype if self.is_pq or dtype in self._DTYPES else "float32"
        )
        # cross-process replication (index/journal.py): when attached, every
        # logical mutation is journaled before being applied by seq-ordered
        # replay, so api and worker processes converge on one row state —
        # the reference's shared on-disk LanceDB semantics
        # (lancedb_store.py:29-41) over HBM-resident slabs
        self._journal = None
        self._journal_collection: Optional[str] = None
        self._applied_seq = 0
        self._journal_poll_sec = 0.25
        self._last_journal_check = 0.0
        self._snapshot_dir: Optional[str] = None
        self._snapshot_name: Optional[str] = None
        self._loaded_snapshot_seq = 0

    # -- internals ----------------------------------------------------------

    def _intern(self, table: Dict[str, int], key: str) -> int:
        if key not in table:
            table[key] = len(table)
        return table[key]

    def _place(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Row-shard a device array over the data axis in multi-chip mode."""

        if self._sharding is None:
            return arr
        return jax.device_put(arr, self._sharding)

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self._capacity:
            return
        new_cap = max(_MIN_CAPACITY, self._capacity or _MIN_CAPACITY)
        while new_cap < needed:
            new_cap *= 2
        if new_cap % self._n_data:  # non-power-of-two meshes
            new_cap += self._n_data - new_cap % self._n_data
        if self.is_pq:  # device slab = m-byte codes; originals grow host-side
            new_slab = jnp.zeros((new_cap, self.pq_m), dtype=jnp.int8)
            host = np.zeros((new_cap, self.dim), np.float32)
            host[: self._size] = self._host_slab[: self._size]
            self._host_slab = host
        else:
            new_slab = jnp.zeros((new_cap, self.dim), dtype=self.dtype)
        new_users = jnp.full((new_cap,), -1, dtype=jnp.int32)
        new_docs = jnp.full((new_cap,), -1, dtype=jnp.int32)
        new_live = jnp.zeros((new_cap,), dtype=bool)
        new_scales = (
            jnp.ones((new_cap,), jnp.float32) if self.dtype == jnp.int8 else None
        )
        if self._size > 0:
            new_slab = new_slab.at[: self._size].set(self._slab[: self._size])
            new_users = new_users.at[: self._size].set(self._users[: self._size])
            new_docs = new_docs.at[: self._size].set(self._docs[: self._size])
            new_live = new_live.at[: self._size].set(self._live[: self._size])
            if new_scales is not None:
                new_scales = new_scales.at[: self._size].set(self._scales[: self._size])
        self._slab, self._users, self._docs, self._live = (
            self._place(new_slab), self._place(new_users),
            self._place(new_docs), self._place(new_live),
        )
        self._scales = self._place(new_scales) if new_scales is not None else None
        self._capacity = new_cap

    def _host_rows_f32(self) -> np.ndarray:
        """Live-prefix slab as f32 on host (dequantized in int8 mode; the
        host-RAM originals in pq mode)."""

        if self._size == 0:
            return np.zeros((0, self.dim), np.float32)
        if self.is_pq:
            return self._host_slab[: self._size]
        if self.dtype == jnp.int8:
            q = np.asarray(self._slab[: self._size], dtype=np.float32)
            s = np.asarray(self._scales[: self._size], dtype=np.float32)
            return q * s[:, None]
        return np.asarray(self._slab[: self._size], dtype=np.float32)

    # -- pq mode (ops/pq.py: codes on device, originals in host RAM) ---------

    _PQ_TRAIN_SAMPLE = 65536

    def _pq_write_codes(self, start: int, count: int) -> None:
        """Encode host rows [start, start+count) into the device code slab.

        Codebooks (re)train when the corpus has quadrupled since the last
        train (each retrain re-encodes everything, so total re-encode work
        stays ~1.33x the final corpus); a retrain is one sampled Lloyd loop
        + one full encode pass. The train sample is strided ON HOST — pq
        exists because the f32 corpus does NOT fit in HBM, so shipping
        ``host_slab[:total]`` to the device just for ``train_pq`` to
        subsample it would be the large-transient wedge all over again."""

        from ..ops import pq as pqops

        total = start + count
        if self._pq is None or total >= 4 * max(self._pq_trained_at, 1):
            from ..ops import ivf as ivf_ops

            sample = self._host_slab[
                ivf_ops._even_indices(total, min(total, self._PQ_TRAIN_SAMPLE))
            ]
            self._pq = pqops.PQData(
                pqops.train_pq(jnp.asarray(sample), m=self.pq_m)
            )
            self._pq_trained_at = total
            # train-quality statistic: mean cosine between rows and their PQ
            # reconstruction on a sample. Encoder-generated corpora measure
            # ~0.9+; isotropic-noise geometry (PQ's worst case — see
            # KERNELS.md §6) measures much lower, and with it ADC shortlist
            # recall. Logged + exported so the operator can see when the
            # data resists m-byte codes (the refine pass still bounds the
            # damage to shortlist membership, never score accuracy).
            rc = self._pq.reconstruction_cosine(
                jnp.asarray(self._host_slab[
                    ivf_ops._even_indices(total, min(total, 16_384))
                ])
            )
            from ..utils.profiling import metrics

            # gauge, not observe: the latency reservoir exports x1000 under
            # a _latency_ms label — 0.83 cosine would read as "830 ms"
            metrics.gauge("index.pq.reconstruction_cosine", rc)
            _logger.info(
                "pq codebooks trained on %d rows (m=%d): reconstruction "
                "cosine %.4f", total, self.pq_m, rc,
            )
            if self.pq_min_quality and rc < self.pq_min_quality:
                # quality gate (VERDICT r2 item 3): the data resists m-byte
                # codes — the ADC shortlist would collapse (refined recall
                # 0.08-0.26 measured on this geometry, KERNELS.md §6).
                # Demote to the exact int8 layout instead of silently
                # serving garbage, exactly as ivf_min_structure discards a
                # structureless layout. Same observability contract: log +
                # /metrics counter; TPU_PQ_MIN_QUALITY=0 overrides.
                self._demote_pq_to_int8(total, rc)
                return
            start, count = 0, total  # codes are stale: re-encode everything
        # chunked at ops.pq.ENCODE_CHUNK (ONE shared constant): bounds both
        # the host->device row transfer and the (m, chunk, K) assignment
        # transient; each pq_encode call then fits its own chunk exactly
        for lo in range(start, start + count, pqops.ENCODE_CHUNK):
            hi = min(lo + pqops.ENCODE_CHUNK, start + count)
            codes = self._pq.encode(jnp.asarray(self._host_slab[lo:hi]))
            self._slab = _write_rows(self._slab, codes, jnp.int32(lo))

    def _demote_pq_to_int8(self, total: int, rc: float) -> None:
        """Switch a pq index to the exact int8 layout in place (quality-gate
        trip). Runs under the index lock from ``_pq_write_codes``; every row
        is re-materialized from the host originals, so no information is
        lost. The demotion is a local physical decision (like ``compact``):
        journal peers replaying the same rows reach the same verdict, since
        the gate statistic is deterministic in the row data. A snapshot of a
        demoted index persists in the int8 form; a later boot with
        ``TPU_INDEX_DTYPE=pq`` retrains on the dequantized rows and demotes
        again at first train (one retrain of boot-time cost, no wrong
        serving in between)."""

        from ..utils.profiling import metrics

        metrics.incr("index.pq.demoted")
        _logger.warning(
            "pq index demoted to int8: reconstruction cosine %.4f < gate "
            "%.2f on %d rows — this geometry resists %d-byte codes; the "
            "exact int8 scan serves instead (override: TPU_PQ_MIN_QUALITY)",
            rc, self.pq_min_quality, total, self.pq_m,
        )
        from ..ops import pq as pqops

        # Build the replacement slab FIRST, in bounded chunks — pq mode
        # exists because the f32 corpus does NOT fit in HBM, so a one-shot
        # quantize of the whole host slab is exactly the large-transient
        # failure mode tools/repro_invalid_argument.py documents. Mode
        # attrs flip only after every chunk succeeded: a device error
        # mid-demotion leaves the index serving its (refine-correct) pq
        # form instead of a half-initialized int8 hybrid.
        slab = self._place(jnp.zeros((self._capacity, self.dim), jnp.int8))
        scales = self._place(jnp.ones((self._capacity,), jnp.float32))
        for lo in range(0, total, pqops.ENCODE_CHUNK):
            hi = min(lo + pqops.ENCODE_CHUNK, total)
            q, s = quantize_rows_int8(jnp.asarray(self._host_slab[lo:hi]))
            slab = _write_rows(slab, q, jnp.int32(lo))
            scales = _write_ids(scales, s, jnp.int32(lo))
        jax.block_until_ready(slab)
        self.is_pq = False
        self.dtype = jnp.int8
        self._dtype_str = "int8"
        self._pq = None
        self._pq_trained_at = 0
        self._host_slab = None
        self._ivf = None  # any layout held pq codes; rebuilt lazily
        self._slab = slab
        self._scales = scales

    def _pq_multi_async(self, queries, uids: np.ndarray, dids: np.ndarray,
                        k: int):
        """ADC candidate dispatch (device, no readback) + an exact host
        refine at collect time (LanceDB refine_factor role): the collector
        gathers the shortlist's f32 originals from host RAM, recomputes true
        cosines, and returns the genuine top-k. The captured host-slab
        reference stays consistent with the captured codes — growth rebinds
        a fresh array, it never mutates captured rows — so unlike a device
        re-dispatch this cannot race donated buffers.

        Multi-chip mode: the code slab is row-sharded like every other
        layout, the ADC scan runs per shard under ``shard_map`` with the
        all_gather candidate merge (parallel/sharded_index.py), and the host
        refine consumes the merged GLOBAL row ids — identical semantics."""

        from ..ops import pq as pqops

        cand = min(max(k * self.pq_refine, k), self._capacity)
        qj = jnp.asarray(
            queries.astype(np.float32) if isinstance(queries, np.ndarray)
            else queries
        )
        if self._sharding is not None:
            ivf = self._ivf  # (re)built by _maybe_ivf at the search entrances
            s = i = None
            if ivf is not None and ivf.is_pq:
                # probed ADC over the per-shard ivf_pq layouts (+ flat tail)
                try:
                    s, i = self._ivf_pq_dispatch(ivf, qj, uids, dids, cand)
                    s, i = _readback_pair(s, i)
                except jax.errors.JaxRuntimeError:
                    s = i = None
                    self._count_fallback("ivf_pq")
                    _logger.warning(
                        "sharded ivf_pq probe failed at runtime; flat ADC retry"
                    )
            if s is None:
                key = ("pq", cand)
                fn = self._shard_fn_cache.get(key)
                if fn is None:
                    from ..parallel.sharded_index import sharded_search_pq_fn

                    fn = sharded_search_pq_fn(self.mesh, cand)
                    self._shard_fn_cache[key] = fn
                s, i = fn(
                    qj, jnp.asarray(uids), jnp.asarray(dids),
                    self._pq.codebooks,
                    self._slab, self._users, self._docs, self._live,
                )
        else:
            ivf = self._ivf  # (re)built by _maybe_ivf at the search entrances
            s = i = None
            if ivf is not None and ivf.is_pq:
                try:
                    s, i = self._ivf_pq_dispatch(ivf, qj, uids, dids, cand)
                    # materialize INSIDE the guard: dispatch errors surface
                    # at readback, and the collector runs outside it
                    s, i = _readback_pair(s, i)
                except jax.errors.JaxRuntimeError:
                    s = i = None
                    self._count_fallback("ivf_pq")
                    _logger.warning(
                        "ivf_pq probe failed at runtime; flat ADC retry"
                    )
            if s is None:
                s, i = _pq_search_multi(
                    self._pq.codebooks, self._slab, self._users, self._docs,
                    self._live, qj, jnp.asarray(uids), jnp.asarray(dids), cand,
                )
        host_rows = self._host_slab
        # captured refs for the scan retry below: consistent with host_rows
        # and the caller's chunk-id snapshot even if the live slab moves on
        books_c, codes_c = self._pq.codebooks, self._slab
        users_c, docs_c, live_c = self._users, self._docs, self._live

        def collect():
            try:
                cs, ci = _readback_pair(s, i)
            except jax.errors.JaxRuntimeError:
                # the fused ADC kernel failed at readback (the opaque
                # runtime-failure class KERNELS.md §3 documents): retry on
                # the scan path against the CAPTURED buffers. If a donated
                # write deleted them meanwhile, this raises again and the
                # async caller's own catch re-runs the whole search fresh.
                self._count_fallback("pq_fused")
                _logger.warning("pq ADC failed at readback; scan-path retry")
                s2, i2 = _pq_search_multi(
                    books_c, codes_c, users_c, docs_c, live_c, qj,
                    jnp.asarray(uids), jnp.asarray(dids), cand, "scan",
                )
                cs, ci = _readback_pair(s2, i2)
            qh = np.asarray(qj, dtype=np.float32)
            return pqops.refine_exact(qh, host_rows, ci, cs, min(k, cand))

        return collect

    def _ivf_pq_dispatch(self, ivf, qj, uids: np.ndarray, dids: np.ndarray,
                         cand: int):
        """Probed ADC over the coded layout + flat-ADC append tail, merged.

        Bucket codes decode against the layout's snapshot codebooks
        (``IVFData.pq_codebooks``); the tail (rows written after the build)
        decodes against the CURRENT codebooks — both approximate the same
        cosine and the exact host refine rescores the merged shortlist, so
        a codebook retrain between build and search costs at most shortlist
        quality, never score correctness."""

        from ..ops.pq import pq_topk
        from ..ops.topk import merge_topk

        uids_j = jnp.asarray(uids)
        dids_j = jnp.asarray(dids)
        s, i = self._ivf_probe_any(ivf, qj, uids_j, dids_j, cand)
        built = ivf.built_rows
        appended = self._size - built
        if appended > 0:
            tail_len = min(
                self._pow2(max(appended, 4096)), self._capacity - built
            )
            tmask = _predicate_mask_multi(
                self._users[built:built + tail_len],
                self._docs[built:built + tail_len],
                self._live[built:built + tail_len],
                uids_j, dids_j,
            )
            # pq_topk routes tails >= 2048 rows onto the fused Pallas ADC
            # (the tail can reach half the corpus before a rebuild triggers)
            s2, i2 = pq_topk(
                qj, self._pq.codebooks, self._slab[built:built + tail_len],
                tmask, min(cand, tail_len),
            )
            s, i = merge_topk(s, i, s2, i2 + built, cand)
        return s, i

    def _tombstone(self, chunk_ids: Sequence[str]) -> None:
        rows = [self._chunk_to_row[c] for c in chunk_ids if c in self._chunk_to_row]
        if not rows:
            return
        self._row_live[rows] = False
        idx = jnp.asarray(np.asarray(rows, dtype=np.int32))
        self._live = self._live.at[idx].set(False)
        if self._ivf is not None:  # keep the bucket-layout liveness in sync
            self._ivf.mark_dead(np.asarray(rows, dtype=np.int64))
        for c in chunk_ids:
            self._chunk_to_row.pop(c, None)

    @staticmethod
    def _count_fallback(path: str) -> None:
        """Production-observable degrade events (VERDICT r1 item 9): the
        opaque TPU ``INVALID_ARGUMENT`` fallback shows up in ``/metrics`` as
        ``index.backend_fallback.*`` counters instead of only a log line
        (reproducer: tools/repro_invalid_argument.py)."""

        from ..utils.profiling import metrics

        metrics.incr("index.backend_fallback")
        metrics.incr(f"index.backend_fallback.{path}")

    def _search_with_fallback(self, fn, *args):
        """Run a jitted search; on a runtime TPU failure retry on the dense
        XLA backend. Observed in practice: the Pallas top-k dispatch can hit
        an opaque ``INVALID_ARGUMENT: TPU backend error`` after very large
        unrelated buffers have lived on the chip (allocator-state dependent);
        exactness is identical on the dense path, so degrade silently-but-
        logged rather than failing the query."""

        try:
            scores, idx = fn(*args, self.backend)
            # force materialization inside the guard: dispatch errors surface
            # at readback, after the jitted call itself returned
            return _readback_pair(scores, idx)
        except jax.errors.JaxRuntimeError:
            if self.backend == "xla":
                raise
            self._count_fallback("dense")
            _logger.warning(
                "search backend %r failed at runtime; retrying on dense xla",
                self.backend,
            )
            scores, idx = fn(*args, "xla")
            return _readback_pair(scores, idx)

    # -- dense (exact full-scan) dispatch ------------------------------------

    def _dense_single(self, queries: np.ndarray, uid: int, did: int, k: int):
        """Exact masked scan, single-tenant scalar predicates (int8 or
        bf16/f32 slab). Also the runtime-failure fallback for IVF search."""

        if self.is_pq:
            q = queries.shape[0]
            return self._pq_multi_async(
                queries, np.full((q,), uid, np.int32),
                np.full((q,), did, np.int32), k,
            )()
        if self.dtype == jnp.int8:
            scores, idx = _search_int8(
                self._slab, self._scales, self._users, self._docs, self._live,
                jnp.asarray(queries.astype(np.float32)),
                jnp.int32(uid), jnp.int32(did), min(k, self._capacity),
            )
            return _readback_pair(scores, idx)
        return self._search_with_fallback(
            _search,
            self._slab, self._users, self._docs, self._live,
            jnp.asarray(queries.astype(np.float32)),
            jnp.int32(uid), jnp.int32(did), min(k, self._capacity),
        )

    def _dense_multi(self, queries: np.ndarray, uids: np.ndarray,
                     dids: np.ndarray, k: int):
        """Exact masked scan with per-query tenant/doc predicates."""

        if self.is_pq:
            return self._pq_multi_async(queries, uids, dids, k)()
        if self.dtype == jnp.int8:
            scores, idx = _search_multi_int8(
                self._slab, self._scales, self._users, self._docs, self._live,
                jnp.asarray(queries.astype(np.float32)),
                jnp.asarray(uids), jnp.asarray(dids), min(k, self._capacity),
            )
            return _readback_pair(scores, idx)
        return self._search_with_fallback(
            _search_multi,
            self._slab, self._users, self._docs, self._live,
            jnp.asarray(queries.astype(np.float32)),
            jnp.asarray(uids), jnp.asarray(dids), min(k, self._capacity),
        )

    def _dense_multi_async(self, queries, uids: np.ndarray,
                           dids: np.ndarray, k: int,
                           backend: Optional[str] = None):
        """Dispatch the exact masked scan WITHOUT forcing readback; returns a
        zero-arg collector that materializes (with the same runtime-failure
        dense-xla retry as :meth:`_search_with_fallback`). Lets the serving
        path overlap text-index, image-index, and encoder work in one device
        pipeline — the tunnel round-trip is paid once, not per stage.

        The collector only materializes; runtime-failure retry lives in
        :meth:`search_batch_multi_async`, which re-runs the WHOLE search
        under the lock — re-dispatching the refs captured here would race
        concurrent upserts, whose donated writes (``_write_rows``
        donate_argnums) delete the captured slab buffer."""

        if self.is_pq:
            return self._pq_multi_async(queries, uids, dids, k)
        qj = jnp.asarray(queries.astype(np.float32))
        if self.dtype == jnp.int8:
            s, i = _search_multi_int8(
                self._slab, self._scales, self._users, self._docs,
                self._live, qj, jnp.asarray(uids), jnp.asarray(dids),
                min(k, self._capacity))
            return lambda: _readback_pair(s, i)
        s, i = _search_multi(
            self._slab, self._users, self._docs, self._live, qj,
            jnp.asarray(uids), jnp.asarray(dids), min(k, self._capacity),
            backend or self.backend)
        return lambda: _readback_pair(s, i)

    # -- multi-chip (row-sharded slab) dispatch ------------------------------

    def _sharded_fn(self, k: int, backend: str):
        key = (k, backend)
        fn = self._shard_fn_cache.get(key)
        if fn is None:
            from ..parallel.sharded_index import (
                sharded_search_fn,
                sharded_search_int8_fn,
            )

            if self.dtype == jnp.int8:
                fn = sharded_search_int8_fn(self.mesh, k)
            else:
                fn = sharded_search_fn(self.mesh, k, backend)
            self._shard_fn_cache[key] = fn
        return fn

    def _dispatch_sharded(self, queries_j, uids, dids, k: int):
        """Multi-chip search: per-shard predicated top-k + all_gather merge.
        Same runtime-failure degrade contract as :meth:`_search_with_fallback`.
        """

        def run(backend):
            fn = self._sharded_fn(k, backend)
            if self.dtype == jnp.int8:
                s, i = fn(queries_j, uids, dids, self._slab, self._scales,
                          self._users, self._docs, self._live)
            else:
                s, i = fn(queries_j, uids, dids, self._slab,
                          self._users, self._docs, self._live)
            return _readback_pair(s, i)

        try:
            return run(self.backend)
        except jax.errors.JaxRuntimeError:
            if self.backend == "xla" or self.dtype == jnp.int8:
                raise
            self._count_fallback("sharded")
            _logger.warning(
                "sharded search backend %r failed at runtime; retrying on dense xla",
                self.backend,
            )
            return run("xla")

    # -- IVF ANN ------------------------------------------------------------

    def build_ivf(self, n_clusters: Optional[int] = None,
                  bucket_factor: float = 1.5, iters: int = 8) -> None:
        """(Re)cluster the current rows into the IVF bucket layout.

        k-means + bucket gather run *outside* the lock against an immutable
        snapshot (the slab's written prefix never mutates in place — appends
        go past ``size``, deletes flip liveness flags), so searches keep
        serving the dense/stale path during the build. On install,
        tombstones that landed mid-build are re-applied wholesale from the
        host liveness array; a :meth:`compact` mid-build aborts the install
        (row ids changed)."""

        from ..ops import ivf as ivf_ops

        if self._sharding is not None:
            # multi-chip composition (VERDICT r2 item 2): per-shard bucket
            # layouts under shard_map with shared global centroids —
            # parallel/sharded_ivf.py. Same gate + install contract below.
            return self._build_ivf_sharded(n_clusters, bucket_factor, iters)

        with self._lock:
            if self._size == 0 or (self.is_pq and self._pq is None):
                self._ivf = None
                return
            snap_size = self._size
            snap_gen = self._generation
            # slice (= copy into fresh buffers) UNDER the lock: upsert's
            # donated writes (_write_rows donate_argnums) invalidate the
            # original arrays, so holding bare references across the unlock
            # races with concurrent appends ("Array has been deleted").
            # Residual-pq rebuilds re-encode every bucket code from the host
            # originals, so the flat code slab is never read — skip the
            # device copy + sync (~size*m bytes dead HBM traffic otherwise).
            slab = (
                None
                if (self.is_pq and self.pq_residual)
                else self._slab[:snap_size]
            )
            users = self._users[:snap_size]
            docs = self._docs[:snap_size]
            live = self._live[:snap_size]
            # int8 slab: quantized rows cluster/probe via per-row scales —
            # the reference's partitioned-and-compressed IVF_PQ design point
            scales = self._scales[:snap_size] if self.dtype == jnp.int8 else None
            # pq: the slab slice IS the codes; capture the codebooks that
            # encoded them (a later retrain re-encodes in place, but this
            # copy + its books stay mutually consistent) and the host
            # originals for clustering ([0, snap_size) never mutates in
            # place — growth/compact rebind fresh arrays)
            pq_books = self._pq.codebooks if self.is_pq else None
            host_rows = self._host_slab if self.is_pq else None
            if slab is not None:
                jax.block_until_ready(slab)

        warm = self._ivf_warm_centroids
        self._ivf_warm_centroids = None  # one-shot; later rebuilds re-train
        if self.is_pq:
            data = self._build_ivf_pq(
                ivf_ops, slab, host_rows, snap_size, pq_books,
                users, docs, live, n_clusters, bucket_factor, iters, warm,
            )
        else:
            data = ivf_ops.build_ivf(
                slab, n_clusters, bucket_factor, iters,
                users=users, docs=docs, live=live, scales=scales,
                centroids=warm,
            )

        self._gate_and_install_ivf(data, snap_size, snap_gen)

    def _gate_and_install_ivf(self, data, snap_size: int, snap_gen: int) -> None:
        """Shared tail of the single-chip and sharded builds: discard
        structureless layouts, re-apply mid-build tombstones, install."""

        from ..ops import ivf as ivf_ops

        baseline = ivf_ops.structureless_baseline(data.n_clusters, self.dim)
        if self.ivf_min_structure and data.structure < self.ivf_min_structure * baseline:
            with self._lock:
                if self._generation != snap_gen:
                    # compact() rebuilt the corpus mid-build: this verdict
                    # belongs to a row set that no longer exists — recording
                    # it would suppress rebuilds of the NEW corpus until 2x
                    # its size (review finding); leave state untouched so
                    # _maybe_ivf re-judges the live rows
                    _logger.info("ivf poor-structure verdict discarded: "
                                 "index compacted mid-build")
                    return
                self._ivf = None
                self._ivf_poor_at = snap_size
            _logger.warning(
                "ivf layout discarded: mean assignment cosine %.3f < %.1fx "
                "structureless baseline %.3f — data has no cluster structure; "
                "serving the exact dense path instead",
                data.structure, self.ivf_min_structure, baseline,
            )
            return

        with self._lock:
            if self._generation != snap_gen:
                _logger.info("ivf build discarded: index compacted mid-build")
                return
            dead = np.flatnonzero(~self._row_live[:snap_size])
            if dead.size:  # tombstones that landed while building
                data.mark_dead(dead)
            self._ivf = data
            self._ivf_poor_at = 0
            _logger.info(
                "ivf built%s: %d rows, %d clusters x %d bucket, "
                "structure %.3f (baseline %.3f)",
                f" ({data.n_shards} shards)" if hasattr(data, "n_shards")
                else "",
                data.built_rows, data.n_clusters, data.bucket_size,
                data.structure, baseline,
            )

    def _build_ivf_sharded(self, n_clusters, bucket_factor: float,
                           iters: int) -> None:
        """Multi-chip (re)build: per-shard bucket layouts over the row-
        sharded slab with shared global centroids
        (:mod:`mmrag_tpu.parallel.sharded_ivf`).

        Snapshot semantics match the single-chip path: full-capacity COPIES
        are taken under the lock (appends' donated writes delete the live
        buffers, so bare references cannot cross the unlock), rows past the
        snapshot size are simply never referenced by the host slot
        bookkeeping, and the generation check aborts a mid-build compact."""

        from ..parallel.sharded_ivf import build_sharded_ivf

        copy = jax.jit(lambda a: a + jnp.zeros((), a.dtype))
        copy_b = jax.jit(lambda a: jnp.logical_or(a, False))
        with self._lock:
            if self._size == 0 or (self.is_pq and self._pq is None):
                self._ivf = None
                return
            snap_size = self._size
            snap_gen = self._generation
            slab = None if self.is_pq else copy(self._slab)
            users = copy(self._users)
            docs = copy(self._docs)
            live = copy_b(self._live)
            scales = (
                copy(self._scales) if self.dtype == jnp.int8 else None
            )
            pq_books = self._pq.codebooks if self.is_pq else None
            pq_codes = (
                copy(self._slab)
                if (self.is_pq and not self.pq_residual) else None
            )
            host_rows = self._host_slab if self.is_pq else None
            if slab is not None:
                jax.block_until_ready(slab)

        warm = self._ivf_warm_centroids
        self._ivf_warm_centroids = None
        if self.is_pq:
            # cluster on the f32 host originals (codes carry no geometry),
            # residual-encode per chunk — the SAME recipe as the single-chip
            # build (_pq_cluster_encode, one definition) — then shard the
            # code slab for the per-shard layout gather
            centroids, rbooks, assign_h, res_codes, structure = (
                self._pq_cluster_encode(host_rows, snap_size, warm,
                                        n_clusters, iters)
            )
            if rbooks is not None:
                codes_h = np.concatenate(
                    [np.asarray(c) for c in res_codes]
                )
                books = rbooks
            else:
                codes_h = np.asarray(pq_codes)[:snap_size]
                books = pq_books
            cap = self._capacity
            codes_pad = np.zeros((cap, self.pq_m), np.int8)
            codes_pad[:snap_size] = codes_h
            codes_slab = jax.device_put(
                jnp.asarray(codes_pad), self._sharding
            )
            data = build_sharded_ivf(
                self.mesh, codes_slab, users, docs, live, snap_size,
                bucket_factor=bucket_factor,
                centroids=centroids, assign=assign_h,
                structure_override=structure, pq_codebooks=books,
                pq_residual=rbooks is not None,
            )
        else:
            data = build_sharded_ivf(
                self.mesh, slab, users, docs, live, snap_size,
                n_clusters=n_clusters, bucket_factor=bucket_factor,
                iters=iters, scales=scales, centroids=warm,
            )
        self._gate_and_install_ivf(data, snap_size, snap_gen)

    def _build_ivf_pq(self, ivf_ops, codes, host_rows, snap_size, books,
                      users, docs, live, n_clusters, bucket_factor, iters,
                      warm):
        """Build the literal IVF_PQ layout: cluster on the f32 HOST
        originals (codes carry no clustering geometry), lay out the m-byte
        codes in buckets. Training pushes only a strided <=131k sample to
        the device; assignment streams the originals through in 65k
        chunks — the full f32 corpus never materializes in HBM (the pq
        mode's reason to exist).

        With ``pq_residual`` (the default, the FAISS/LanceDB IVF_PQ
        convention) the bucket codes are NOT the flat slab codes: each row
        re-encodes as ``x - centroid[assign]`` against codebooks trained on
        those residuals, so within-cluster geometry — which raw coding
        blurs into the cluster mean — gets the codebooks' full resolution.
        The residual encode folds into the same chunked assignment pass
        (one extra matmul per chunk)."""

        centroids, rbooks, assign_h, res_codes, structure = (
            self._pq_cluster_encode(host_rows, snap_size, warm, n_clusters,
                                    iters)
        )
        if rbooks is not None:
            codes = (
                res_codes[0] if len(res_codes) == 1
                else jnp.concatenate(res_codes, axis=0)
            )
            books = rbooks
        return ivf_ops.build_ivf(
            codes, bucket_factor=bucket_factor, users=users, docs=docs,
            live=live, centroids=centroids, assign=assign_h,
            structure_override=structure, pq_codebooks=books,
            pq_residual=rbooks is not None,
        )

    def _pq_cluster_encode(self, host_rows, snap_size: int, warm,
                           n_clusters, iters: int):
        """Shared ivf_pq layout prep for the single-chip AND sharded builds
        (one definition so sampling/chunking fixes cannot diverge — review
        finding): global centroids (warm snapshot or sampled kmeans),
        residual codebooks when enabled, and the chunked
        assignment(+residual-encode) pass over the host originals. Returns
        ``(centroids, rbooks_or_None, assign_h, res_codes_or_None,
        structure)``."""

        from ..ops import ivf as ivf_ops
        from ..ops import pq as pqops

        sample = None
        if warm is not None:
            centroids = jnp.asarray(warm, jnp.float32)
        else:
            if n_clusters is None:
                n_clusters = ivf_ops.default_n_clusters(snap_size)
            # evenly spaced (not ceil-stride prefix): full 131k sample at any
            # snap_size, spanning the whole insertion order (ADVICE r2)
            sample = jnp.asarray(host_rows[
                ivf_ops._even_indices(snap_size, min(snap_size, 131072))
            ])
            centroids, _ = ivf_ops.kmeans(
                sample, n_clusters, iters, train_sample=0
            )
        rbooks = None
        if self.pq_residual:
            # residual codebooks train on a strided sample's residuals
            # (sample assignment is one matmul; full-corpus assignments
            # stream in the chunk loop below). Reuse the kmeans sample when
            # the cold-start path above already pushed one — re-strided, not
            # prefix-sliced, so coverage stays even across the corpus; a
            # sample already at/below the cap skips the identity gather
            # (ADVICE r2).
            if sample is None:
                sample = jnp.asarray(host_rows[
                    ivf_ops._even_indices(
                        snap_size, min(snap_size, self._PQ_TRAIN_SAMPLE)
                    )
                ])
            rsample = (
                sample
                if int(sample.shape[0]) <= self._PQ_TRAIN_SAMPLE
                else sample[
                    ivf_ops._even_indices(
                        int(sample.shape[0]), self._PQ_TRAIN_SAMPLE
                    )
                ]
            )
            a_s, _ = ivf_ops._assign_with_structure(rsample, centroids)
            res_sample = rsample - jnp.take(centroids, a_s, axis=0)
            rbooks = pqops.train_pq(res_sample, m=self.pq_m)
        assigns: List[np.ndarray] = []
        res_codes: List[jnp.ndarray] = []
        weighted = 0.0
        for lo in range(0, snap_size, pqops.ENCODE_CHUNK):
            hi = min(lo + pqops.ENCODE_CHUNK, snap_size)
            chunk = jnp.asarray(host_rows[lo:hi])
            a, st = ivf_ops._assign_with_structure(chunk, centroids)
            assigns.append(np.asarray(a))
            weighted += float(st) * chunk.shape[0]
            if rbooks is not None:
                res = chunk - jnp.take(centroids, a, axis=0)
                res_codes.append(pqops.pq_encode(res, rbooks))
        return (
            centroids, rbooks, np.concatenate(assigns),
            res_codes if rbooks is not None else None,
            weighted / snap_size,
        )

    def drop_ivf(self) -> None:
        with self._lock:
            self._ivf = None

    def _build_ivf_background(self) -> None:
        if self._ivf_building:
            return
        self._ivf_building = True

        def run():
            try:
                self.build_ivf()
            except Exception:
                _logger.exception("background ivf build failed")
            finally:
                self._ivf_building = False
                with _ivf_builds_lock:
                    _ivf_builds.discard(threading.current_thread())

        t = threading.Thread(target=run, name="ivf-build", daemon=True)
        with _ivf_builds_lock:
            _ivf_builds.add(t)
        t.start()

    def _maybe_ivf(self):
        """Return the current layout (possibly stale; the tail scan covers
        staleness) and kick off a background (re)build when warranted —
        searches never wait on k-means."""

        if not self.use_ivf:
            return self._ivf  # explicit build_ivf() still honored
        build = (
            self._build_ivf_background if self.ivf_build_async else self.build_ivf
        )
        if self._ivf is None:
            if self._ivf_poor_at and self._size < 2 * self._ivf_poor_at:
                return None  # judged structureless; retry once corpus doubles
            if self._size >= self.ivf_min_rows:
                build()
            return self._ivf
        tail = self._size - self._ivf.built_rows
        if tail > max(self._ivf.built_rows // 2, 4096):
            build()  # tail grew past half the clustered set
        return self._ivf

    @staticmethod
    def _pow2(n: int) -> int:
        return 1 << max(n - 1, 0).bit_length()

    def _ivf_search(self, ivf, queries_j, uids, dids, k, fallback):
        """Predicated probe (tenant/doc/live evaluated in bucket layout,
        in-kernel on TPU) + exact spill, then exact-score the append tail
        (rows written after the build) and merge — correctness of membership
        never depends on cluster freshness. A runtime TPU failure degrades to
        ``fallback()`` (the dense path — same contract as
        :meth:`_search_with_fallback`)."""

        try:
            return self._ivf_search_inner(ivf, queries_j, uids, dids, k)
        except jax.errors.JaxRuntimeError:
            self._count_fallback("ivf")
            _logger.warning("ivf search failed at runtime; dense xla retry")
            return fallback()

    def _ivf_probe_any(self, ivf, queries_j, uids, dids, k):
        """Probe a layout — single-chip (``ivf_search_pred``) or sharded
        (the cached shard_map search fn) — returning device (scores, idx)
        with GLOBAL row ids either way."""

        from ..ops.ivf import ivf_search_pred
        from ..parallel.sharded_ivf import ShardedIVFData

        if not isinstance(ivf, ShardedIVFData):
            return ivf_search_pred(ivf, queries_j, uids, dids, k,
                                   self.ivf_nprobe)
        from ..ops.ivf import _use_pallas_probe
        from ..parallel.sharded_ivf import (
            sharded_ivf_kind,
            sharded_ivf_search_args,
            sharded_ivf_search_fn,
        )

        kind = sharded_ivf_kind(ivf)
        nprobe = min(self.ivf_nprobe, ivf.n_clusters)
        use_pallas = kind != "adc" and _use_pallas_probe(
            ivf.bucket_size, int(ivf.buckets.shape[-1]),
            ivf.buckets.dtype.itemsize,
        )
        key = ("sivf", kind, k, nprobe, use_pallas,
               ivf.spill_size > 0, ivf.pq_residual)
        fn = self._shard_fn_cache.get(key)
        if fn is None:
            fn = sharded_ivf_search_fn(
                self.mesh, kind, k, nprobe, use_pallas,
                has_spill=ivf.spill_size > 0, residual=ivf.pq_residual,
            )
            self._shard_fn_cache[key] = fn
        head = [queries_j, uids, dids, ivf.centroids]
        if kind == "adc":
            head.append(ivf.pq_codebooks)
        return fn(*head, *sharded_ivf_search_args(ivf))

    def _ivf_search_inner(self, ivf, queries_j, uids, dids, k):
        from ..ops.topk import merge_topk

        scores, idx = self._ivf_probe_any(ivf, queries_j, uids, dids, k)
        built = ivf.built_rows
        appended = self._size - built
        if appended > 0:
            # pad the tail to a power of two (bounded compile set) instead of
            # scanning to capacity — dead padding is masked either way, but
            # scanning a whole growth tier was measured dense-scan-sized
            tail_len = min(self._pow2(max(appended, 4096)), self._capacity - built)
            tmask = _predicate_mask_multi(
                self._users[built:built + tail_len],
                self._docs[built:built + tail_len],
                self._live[built:built + tail_len],
                uids, dids,
            )
            if self.dtype == jnp.int8:
                from ..ops.topk import _cosine_topk_int8

                # same query quantization as the probe path, so tail scores
                # merge on a consistent scale
                s2, i2 = _cosine_topk_int8(
                    queries_j, self._slab[built:built + tail_len],
                    self._scales[built:built + tail_len], tmask,
                    min(k, tail_len),
                )
            else:
                s2, i2 = cosine_topk(
                    queries_j, self._slab[built:built + tail_len], tmask,
                    min(k, tail_len), "xla",
                )
            scores, idx = merge_topk(scores, idx, s2, i2 + built, k)
        return _readback_pair(scores, idx)

    # -- public API ---------------------------------------------------------

    def __len__(self) -> int:
        with self._lock:
            return int(self._row_live.sum())

    # -- cross-process replication ------------------------------------------

    def attach_journal(
        self, journal, collection: str, directory: str, name: str,
        poll_sec: float = 0.25,
    ) -> None:
        """Join a shared mutation journal (:mod:`mmrag_tpu.index.journal`).

        ``directory``/``name`` locate this index's snapshot for gap recovery.
        Replays any tail the loaded snapshot didn't cover, so an api process
        booting after a worker ingest sees the worker's rows immediately."""

        with self._lock:
            self._journal = journal
            self._journal_collection = collection
            self._snapshot_dir = directory
            self._snapshot_name = name
            self._journal_poll_sec = poll_sec
            self._applied_seq = self._loaded_snapshot_seq
            self._replay_through()

    def _maybe_replay(self) -> None:
        """Throttled read-path catch-up: one SQLite point read at most every
        ``poll_sec``; replay only when a peer appended past our cursor."""

        if self._journal is None:
            return
        import time as _time

        now = _time.monotonic()
        if now - self._last_journal_check < self._journal_poll_sec:
            return
        self._last_journal_check = now
        coll = self._journal_collection
        if (
            self._journal.max_seq(coll) > self._applied_seq
            or self._journal.compacted_upto(coll) > self._applied_seq
        ):
            self._replay_through()

    def _replay_through(self, target_seq: Optional[int] = None) -> int:
        """Apply journal entries in seq order up to the tip. Returns the row
        count produced by the entry with ``target_seq`` (the caller's own
        append), 0 otherwise."""

        from . import journal as _journal

        result = 0
        with self._lock:
            if self._journal.compacted_upto(self._journal_collection) > self._applied_seq:
                # entries between our cursor and the newest snapshot were
                # compacted away — tail replay is impossible; recover from
                # the snapshot that covered them
                self._reload_snapshot()
            entries = self._journal.entries_after(
                self._journal_collection, self._applied_seq
            )
            for seq, op, payload in entries:
                if op == _journal.OP_UPSERT:
                    n = self._apply_upsert(_journal.decode_rows(payload))
                elif op == _journal.OP_DELETE_DOC:
                    n = self._apply_delete_document(payload.decode("utf-8"))
                else:  # entries from a newer schema: converge-at-boot instead
                    _logger.warning("unknown journal op %r (seq %d)", op, seq)
                    n = 0
                self._applied_seq = seq
                if seq == target_seq:
                    result = n
        return result

    def _reload_snapshot(self) -> None:
        """Replace in-memory state with the newest on-disk snapshot (gap
        recovery after journal compaction outpaced this process)."""

        manifest = os.path.join(
            self._snapshot_dir, f"{self._snapshot_name}.manifest.json"
        )
        if not os.path.exists(manifest):
            # compaction only runs after a successful save, so this is
            # unreachable unless the snapshot was deleted out-of-band
            _logger.error("journal gap but no snapshot at %s", manifest)
            return
        fresh = VectorIndex.load(
            self._snapshot_dir, self._snapshot_name, self._dtype_str,
            backend="ivf" if self.use_ivf else self.backend,
            ivf_nprobe=self.ivf_nprobe, ivf_min_rows=self.ivf_min_rows,
            ivf_min_structure=self.ivf_min_structure, mesh=self.mesh,
            pq_m=self.pq_m, pq_refine=self.pq_refine,
            pq_residual=self.pq_residual,
            pq_min_quality=self.pq_min_quality,
        )
        with self._lock:
            for attr in (
                "_capacity", "_size", "_slab", "_users", "_docs", "_live",
                "_scales", "_chunk_ids", "_row_user", "_row_doc", "_row_live",
                "_chunk_to_row", "_user_intern", "_doc_intern",
                "_ivf_warm_centroids", "_ivf_poor_at",
                "_pq", "_pq_trained_at", "_host_slab",
                # mode attrs: a pq index that demoted to int8 (quality gate)
                # must carry its demotion through a snapshot reload
                "is_pq", "dtype", "_dtype_str",
            ):
                # _ivf_poor_at included: a poor-structure verdict on the
                # pre-reload corpus must not suppress IVF builds of the
                # replacement corpus (same stale-verdict class _build_ivf
                # guards with the generation check)
                setattr(self, attr, getattr(fresh, attr))
            self._ivf = None
            self._generation += 1  # aborts in-flight background IVF builds
            self._applied_seq = fresh._loaded_snapshot_seq
            _logger.info(
                "index %s reloaded from snapshot (seq %d)",
                self._snapshot_name, self._applied_seq,
            )

    def upsert(self, rows: Sequence[VectorRow]) -> int:
        """Delete-then-add upsert; returns number of rows written.

        With a journal attached the mutation is appended to the shared log
        first, then applied by seq-ordered replay (total order across
        processes); without one it applies directly."""

        if not rows:
            return 0
        if self._journal is None:
            return self._apply_upsert(rows)
        from . import journal as _journal

        rows = list(rows)
        for r in rows:  # validate BEFORE journaling: peers must never see
            if len(r.embedding) != self.dim:  # an entry that cannot apply
                raise ValueError(
                    f"dim mismatch: index {self.dim}, rows {len(r.embedding)}"
                )
        blob = _journal.encode_rows(rows)
        with self._lock:
            seq = self._journal.append(
                self._journal_collection, _journal.OP_UPSERT, blob
            )
            return self._replay_through(seq)

    def _apply_upsert(self, rows: Sequence[VectorRow]) -> int:
        with self._lock:
            # validate BEFORE tombstoning: a rejected upsert must not delete
            # the rows it failed to replace
            mat = np.stack([r.embedding for r in rows]).astype(np.float32)
            if mat.shape[1] != self.dim:
                raise ValueError(f"dim mismatch: index {self.dim}, rows {mat.shape[1]}")
            self._tombstone([r.chunk_id for r in rows])
            n = len(rows)
            start = self._size
            self._ensure_capacity(start + n)
            # normalize on write (reference lancedb_store.py:63-69)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.maximum(norms, 1e-12)
            users = np.asarray(
                [self._intern(self._user_intern, r.user_id) for r in rows], np.int32
            )
            docs = np.asarray(
                [self._intern(self._doc_intern, r.document_id) for r in rows], np.int32
            )
            if self.is_pq:
                self._host_slab[start : start + n] = mat
                self._pq_write_codes(start, n)
            elif self.dtype == jnp.int8:
                q, s = quantize_rows_int8(jnp.asarray(mat))
                self._slab = _write_rows(self._slab, q, jnp.int32(start))
                self._scales = _write_ids(self._scales, s, jnp.int32(start))
            else:
                self._slab = _write_rows(self._slab, jnp.asarray(mat), jnp.int32(start))
            self._users = _write_ids(self._users, jnp.asarray(users), jnp.int32(start))
            self._docs = _write_ids(self._docs, jnp.asarray(docs), jnp.int32(start))
            self._live = _write_ids(
                self._live, jnp.ones(n, dtype=bool), jnp.int32(start)
            )
            self._chunk_ids.extend(r.chunk_id for r in rows)
            self._row_user.extend(r.user_id for r in rows)
            self._row_doc.extend(r.document_id for r in rows)
            self._row_live = np.concatenate([self._row_live, np.ones(n, dtype=bool)])
            for i, r in enumerate(rows):
                self._chunk_to_row[r.chunk_id] = start + i
            self._size += n
            return n

    def delete_document(self, document_id: str) -> int:
        """Tombstone every row of a document (journaled when attached)."""

        if self._journal is None:
            return self._apply_delete_document(document_id)
        from . import journal as _journal

        with self._lock:
            seq = self._journal.append(
                self._journal_collection, _journal.OP_DELETE_DOC,
                document_id.encode("utf-8"),
            )
            return self._replay_through(seq)

    def _apply_delete_document(self, document_id: str) -> int:
        with self._lock:
            doomed = [
                c
                for c, row in self._chunk_to_row.items()
                if self._row_doc[row] == document_id
            ]
            self._tombstone(doomed)
            return len(doomed)

    def search(
        self,
        query: np.ndarray,
        user_id: str,
        k: int,
        document_id: Optional[str] = None,
    ) -> List[Tuple[str, float]]:
        """Single-query convenience wrapper over :meth:`search_batch`."""

        return self.search_batch(query[None, :], user_id, k, document_id)[0]

    def search_batch(
        self,
        queries: np.ndarray,
        user_id: str,
        k: int,
        document_id: Optional[str] = None,
    ) -> List[List[Tuple[str, float]]]:
        """Exact masked cosine top-k. Returns per-query ``(chunk_id, score)``
        lists sorted descending, only live rows of this tenant (and document,
        when filtered) — predicate applied *pre*-top-k on device."""

        self._maybe_replay()
        with self._lock:
            if self._size == 0 or user_id not in self._user_intern:
                return [[] for _ in range(queries.shape[0])]
            uid = self._user_intern[user_id]
            if document_id is not None:
                if document_id not in self._doc_intern:
                    return [[] for _ in range(queries.shape[0])]
                did = self._doc_intern[document_id]
            else:
                did = -1
            n_queries = queries.shape[0]
            queries = _pad_queries(queries)
            ivf = self._maybe_ivf()
            if self.is_pq:
                # pq handles its own sharded dispatch inside _pq_multi_async
                scores, idx = self._dense_single(queries, uid, did, k)
            elif self._sharding is not None:
                q = queries.shape[0]
                qj = jnp.asarray(queries.astype(np.float32))
                uid_v = jnp.full((q,), uid, jnp.int32)
                did_v = jnp.full((q,), did, jnp.int32)
                kk = min(k, self._capacity)
                if ivf is not None:  # per-shard bucket layouts (sharded_ivf)
                    scores, idx = self._ivf_search(
                        ivf, qj, uid_v, did_v, kk,
                        fallback=lambda: self._dispatch_sharded(
                            qj, uid_v, did_v, kk),
                    )
                else:
                    scores, idx = self._dispatch_sharded(qj, uid_v, did_v, kk)
            elif ivf is not None:  # ivf layout serves bf16/f32 AND int8 slabs
                q = queries.shape[0]
                scores, idx = self._ivf_search(
                    ivf, jnp.asarray(queries.astype(np.float32)),
                    jnp.full((q,), uid, jnp.int32), jnp.full((q,), did, jnp.int32),
                    min(k, self._capacity),
                    fallback=lambda: self._dense_single(queries, uid, did, k),
                )
            else:
                scores, idx = self._dense_single(queries, uid, did, k)
            scores = np.asarray(scores)
            idx = np.asarray(idx)
            out: List[List[Tuple[str, float]]] = []
            for qi in range(n_queries):
                hits = []
                for score, row in zip(scores[qi], idx[qi]):
                    if score <= -1e29 or len(hits) >= k:
                        break
                    hits.append((self._chunk_ids[row], float(score)))
                out.append(hits)
            return out

    def search_batch_multi(
        self,
        queries: np.ndarray,  # (q, dim)
        user_ids: Sequence[str],  # one tenant per query row
        k: int,
        document_ids: Optional[Sequence[Optional[str]]] = None,
    ) -> List[List[Tuple[str, float]]]:
        """Batched search where EVERY query carries its own tenant (and
        optional document) predicate — one device dispatch for a coalesced
        cross-tenant micro-batch. The per-query mask is applied inside the
        scoring kernel, so isolation holds exactly as in :meth:`search_batch`.
        """

        return self.search_batch_multi_async(queries, user_ids, k, document_ids)()

    def search_batch_multi_async(
        self,
        queries,  # (q, dim) np OR device array (no sync forced on the latter)
        user_ids: Sequence[str],
        k: int,
        document_ids: Optional[Sequence[Optional[str]]] = None,
        _attempt: int = 0,
    ):
        """:meth:`search_batch_multi` split into dispatch + collect: returns a
        zero-arg callable producing the hit lists. On the dense path the
        dispatch is issued asynchronously, so callers can put several index
        dispatches (and the query-embed chain feeding them) in flight and
        block once — the serving hot path's round-trip economy.

        ``_attempt`` is the internal readback-failure retry depth: 0 = first
        dispatch; 1 = re-run with fresh refs under the lock (covers the
        donated-slab race with concurrent upserts); 2 = force the exact
        dense-xla scan (covers a persistently failing accelerated backend).
        Layouts with no lower rung to descend to (pq, an explicit xla
        backend, int8 already on the plain dense scan) stop after depth 1.
        A failure at the last rung propagates — retries are strictly
        bounded."""

        q = queries.shape[0]
        if len(user_ids) != q:
            raise ValueError(f"{len(user_ids)} user_ids for {q} queries")
        if document_ids is not None and len(document_ids) != q:
            raise ValueError(f"{len(document_ids)} document_ids for {q} queries")
        self._maybe_replay()
        with self._lock:
            if self._size == 0:
                return lambda: [[] for _ in range(q)]
            uids = np.asarray(
                [self._user_intern.get(u, -2) for u in user_ids], np.int32
            )
            dids = np.full(q, -1, np.int32)
            if document_ids is not None:
                for i, d in enumerate(document_ids):
                    if d is None:
                        continue
                    # doc this index never saw -> positive sentinel that can
                    # never equal an interned id (negative would mean "no
                    # filter"), so the query matches nothing
                    dids[i] = self._doc_intern.get(d, np.iinfo(np.int32).max)
            queries = _pad_queries(queries)
            if queries.shape[0] > q:  # pad rows match no tenant (-2 sentinel)
                pad = queries.shape[0] - q
                uids = np.concatenate([uids, np.full(pad, -2, np.int32)])
                dids = np.concatenate([dids, np.full(pad, -1, np.int32)])
            ivf = self._maybe_ivf()
            pending = None
            if self.is_pq:
                # pq handles its own sharded dispatch inside _pq_multi_async
                pending = self._dense_multi_async(queries, uids, dids, k)
                scores = idx = None
            elif _attempt >= 2:
                # final rung: exact dense scan on the always-correct xla
                # backend, bypassing sharded/ivf/Pallas layouts entirely
                pending = self._dense_multi_async(
                    queries, uids, dids, k, backend="xla"
                )
                scores = idx = None
            elif self._sharding is not None:
                qj = jnp.asarray(queries.astype(np.float32))
                uids_j = jnp.asarray(uids)
                dids_j = jnp.asarray(dids)
                kk = min(k, self._capacity)
                if ivf is not None:  # per-shard bucket layouts (sharded_ivf)
                    scores, idx = self._ivf_search(
                        ivf, qj, uids_j, dids_j, kk,
                        fallback=lambda: self._dispatch_sharded(
                            qj, uids_j, dids_j, kk),
                    )
                else:
                    scores, idx = self._dispatch_sharded(qj, uids_j, dids_j, kk)
            elif ivf is not None:  # ivf layout serves bf16/f32 AND int8 slabs
                scores, idx = self._ivf_search(
                    ivf, jnp.asarray(queries.astype(np.float32)),
                    jnp.asarray(uids), jnp.asarray(dids),
                    min(k, self._capacity),
                    fallback=lambda: self._dense_multi(queries, uids, dids, k),
                )
            else:
                pending = self._dense_multi_async(queries, uids, dids, k)
                scores = idx = None
            # int8 took the plain dense scan (no ivf/sharded layout): the
            # attempt-2 "force dense xla" rung would re-run the IDENTICAL
            # _search_multi_int8 kernel (the int8 branch ignores the backend
            # override), so it earns only the fresh-refs retry
            dense_int8 = (
                pending is not None and not self.is_pq
                and self.dtype == jnp.int8
            )
            # snapshot: rows only append under the slab generation this
            # dispatch captured; compact() rebinds a fresh list, leaving this
            # reference consistent with the dispatched arrays
            chunk_ids = self._chunk_ids

        def collect() -> List[List[Tuple[str, float]]]:
            try:
                s, ix = (
                    pending() if pending is not None
                    else _readback_pair(scores, idx)
                )
            except jax.errors.JaxRuntimeError:
                # a concurrent upsert may have donated (deleted) the slab
                # buffers this dispatch captured, so re-dispatching them
                # would raise "Array has been deleted". Retry ladder, each
                # rung re-running the WHOLE search under the lock with fresh
                # refs: attempt 1 keeps the layout/backend (donation race);
                # attempt 2 forces the exact dense-xla scan (persistent
                # backend failure). pq/xla/plain-dense-int8 have no lower
                # rung to descend to after the fresh-refs re-run, so they
                # get one retry only.
                if _attempt >= 2 or (
                    _attempt >= 1
                    and (self.is_pq or dense_int8 or self.backend == "xla")
                ):
                    raise
                self._count_fallback("dense_async")
                _logger.warning(
                    "async search backend %r failed at readback "
                    "(attempt %d); re-running with fresh refs%s",
                    self.backend, _attempt,
                    " on dense xla" if _attempt >= 1 else "",
                )
                return self.search_batch_multi_async(
                    np.asarray(queries)[:q], user_ids, k, document_ids,
                    _attempt=_attempt + 1,
                )()
            out: List[List[Tuple[str, float]]] = []
            for qi in range(q):
                hits = []
                for score, row in zip(s[qi], ix[qi]):
                    if score <= -1e29 or len(hits) >= k:
                        break
                    hits.append((chunk_ids[row], float(score)))
                out.append(hits)
            return out

        return collect

    # -- maintenance --------------------------------------------------------

    def compact(self) -> int:
        """Drop tombstoned rows, rebuilding the slab. Returns live count."""

        with self._lock:
            live_rows = np.flatnonzero(self._row_live)
            mat = native.gather_rows(self._host_rows_f32(), live_rows)
            chunk_ids = [self._chunk_ids[i] for i in live_rows]
            users = [self._row_user[i] for i in live_rows]
            docs = [self._row_doc[i] for i in live_rows]
            self._capacity = 0
            self._size = 0
            self._slab = self._users = self._docs = self._live = None
            self._scales = None
            if self.is_pq:  # fresh codebooks for the compacted corpus
                self._pq = None
                self._pq_trained_at = 0
                self._host_slab = np.zeros((0, self.dim), np.float32)
            self._ivf = None  # row ids change; rebuilt lazily on next search
            self._generation += 1  # aborts any in-flight background build
            self._chunk_ids, self._row_user, self._row_doc = [], [], []
            self._row_live = np.zeros(0, dtype=bool)
            self._chunk_to_row = {}
            self._user_intern, self._doc_intern = {}, {}
            rows = [
                VectorRow(
                    chunk_id=c, user_id=u, document_id=d,
                    modality="text" if self.dim != 512 else "image", embedding=e,
                )
                for c, u, d, e in zip(chunk_ids, users, docs, mat)
            ]
            if rows:
                # direct apply: compaction is a physical rebuild, not a
                # logical mutation — peers' journals must not see it
                self._apply_upsert(rows)
            return len(rows)

    # -- persistence --------------------------------------------------------

    def save(self, directory: str, name: str) -> None:
        """Atomic snapshot: row ids ride INSIDE the .npz (string arrays), so
        one ``os.replace`` commits data+ids together — a crash can never pair
        new embeddings with a stale manifest row-by-row. The manifest stays
        as a human-readable summary and legacy-load fallback.

        With a journal attached, the snapshot first replays to the log tip
        (so an api-side save can never clobber worker-ingested rows with a
        stale in-memory state — both processes' mutations are in the log),
        stamps the covered seq into the manifest, and compacts entries the
        snapshot covers (keeping the journal's safety window so live peers
        tail-replay instead of snapshot-reloading)."""

        with self._lock:
            if self._journal is not None:
                self._replay_through()
            os.makedirs(directory, exist_ok=True)
            live_rows = np.flatnonzero(self._row_live)
            mat = (
                native.gather_rows(self._host_rows_f32(), live_rows)
                if self._size and self.dtype != jnp.int8
                else np.zeros((0, self.dim), np.float32)
            )
            # fixed-width unicode arrays: pickle-free, loadable without
            # allow_pickle
            ids_arrays = {
                "chunk_ids": np.asarray([self._chunk_ids[i] for i in live_rows], dtype=np.str_),
                "user_ids": np.asarray([self._row_user[i] for i in live_rows], dtype=np.str_),
                "document_ids": np.asarray([self._row_doc[i] for i in live_rows], dtype=np.str_),
            }
            # ids live in the npz (atomic with the data); the manifest is a
            # small human-readable summary — legacy manifests with full id
            # lists are still honored by load()
            manifest = {"dim": self.dim, "rows": int(live_rows.size)}
            if self._journal is not None:
                manifest["snapshot_seq"] = self._applied_seq
            if self._ivf is not None:
                # persist centroids so the restored index warm-rebuilds its
                # layout with one assignment matmul instead of full k-means
                ids_arrays["ivf_centroids"] = np.asarray(
                    self._ivf.centroids, np.float32
                )
            if self.is_pq and self._pq is not None and self._size:
                # persist codebooks + m-byte codes (tiny next to the bf16
                # originals) so a restart installs them directly instead of
                # retraining and re-encoding the whole corpus at boot — the
                # ivf_centroids analogue for the pq layout
                ids_arrays["pq_codebooks"] = np.asarray(
                    self._pq.codebooks, np.float32
                )
                ids_arrays["pq_codes"] = np.asarray(
                    self._slab[: self._size]
                )[live_rows]
            npz_tmp = os.path.join(directory, f"{name}.npz.tmp")
            if self.dtype == jnp.int8:
                # lossless: persist the quantized rows + scales directly (4x
                # smaller than dequantized f32, and no re-quantization drift
                # across save/load cycles)
                if self._size:
                    q_host = np.asarray(self._slab[: self._size])[live_rows]
                    s_host = np.asarray(self._scales[: self._size], np.float32)[live_rows]
                else:  # empty index: nothing quantized yet
                    q_host = np.zeros((0, self.dim), np.int8)
                    s_host = np.zeros((0,), np.float32)
                payload = {"embeddings_int8": q_host, "scales": s_host}
            elif self.dtype == jnp.bfloat16:
                # HBM-ready bf16 bits on disk: half the bytes, threaded
                # native conversion, exact (the slab is already bf16)
                payload = {"embeddings_bf16": native.f32_to_bf16(mat)}
            else:
                payload = {"embeddings": mat}
            with open(npz_tmp, "wb") as fh:
                np.savez(fh, **payload, **ids_arrays)
            os.replace(npz_tmp, os.path.join(directory, f"{name}.npz"))
            tmp = os.path.join(directory, f"{name}.manifest.json.tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(directory, f"{name}.manifest.json"))
            if self._journal is not None:
                self._journal.compact(self._journal_collection, self._applied_seq)

    def _install_prequantized(self, chunk_ids, user_ids, doc_ids, q_mat, scales) -> None:
        """Populate an EMPTY int8 index from persisted quantized rows —
        bypasses normalize+quantize so save/load roundtrips are bit-exact."""

        with self._lock:
            assert self._size == 0 and self.dtype == jnp.int8
            n = len(chunk_ids)
            if n == 0:
                return
            self._ensure_capacity(n)
            users = np.asarray(
                [self._intern(self._user_intern, u) for u in user_ids], np.int32
            )
            docs = np.asarray(
                [self._intern(self._doc_intern, d) for d in doc_ids], np.int32
            )
            self._slab = _write_rows(self._slab, jnp.asarray(q_mat, jnp.int8), jnp.int32(0))
            self._scales = _write_ids(self._scales, jnp.asarray(scales, jnp.float32), jnp.int32(0))
            self._users = _write_ids(self._users, jnp.asarray(users), jnp.int32(0))
            self._docs = _write_ids(self._docs, jnp.asarray(docs), jnp.int32(0))
            self._live = _write_ids(self._live, jnp.ones(n, bool), jnp.int32(0))
            self._chunk_ids = list(chunk_ids)
            self._row_user = list(user_ids)
            self._row_doc = list(doc_ids)
            self._row_live = np.ones(n, dtype=bool)
            self._chunk_to_row = {c: i for i, c in enumerate(chunk_ids)}
            self._size = n

    def _install_precoded(self, chunk_ids, user_ids, doc_ids, mat,
                          codebooks, codes) -> None:
        """Populate an EMPTY pq index from a snapshot's codebooks + codes —
        warm restart skips both the retrain and the full re-encode pass.
        ``mat`` (the bf16-rounded f32 originals) refills the host slab for
        the refine pass and future retrains."""

        from ..ops import pq as pqops

        with self._lock:
            assert self._size == 0 and self.is_pq
            n = len(chunk_ids)
            if n == 0:
                return
            self._ensure_capacity(n)
            self._host_slab[:n] = np.asarray(mat, np.float32)
            self._pq = pqops.PQData(jnp.asarray(codebooks, jnp.float32))
            self._pq_trained_at = n
            users = np.asarray(
                [self._intern(self._user_intern, u) for u in user_ids], np.int32
            )
            docs = np.asarray(
                [self._intern(self._doc_intern, d) for d in doc_ids], np.int32
            )
            self._slab = _write_rows(
                self._slab, jnp.asarray(codes, jnp.int8), jnp.int32(0)
            )
            self._users = _write_ids(self._users, jnp.asarray(users), jnp.int32(0))
            self._docs = _write_ids(self._docs, jnp.asarray(docs), jnp.int32(0))
            self._live = _write_ids(self._live, jnp.ones(n, bool), jnp.int32(0))
            self._chunk_ids = list(chunk_ids)
            self._row_user = list(user_ids)
            self._row_doc = list(doc_ids)
            self._row_live = np.ones(n, dtype=bool)
            self._chunk_to_row = {c: i for i, c in enumerate(chunk_ids)}
            self._size = n

    @classmethod
    def load(cls, directory: str, name: str, dtype: str = "bfloat16",
             backend: str = "auto", ivf_nprobe: Optional[int] = None,
             ivf_min_rows: Optional[int] = None,
             ivf_min_structure: Optional[float] = None,
             mesh=None, pq_m: Optional[int] = None,
             pq_refine: Optional[int] = None,
             pq_residual: Optional[bool] = None,
             pq_min_quality: Optional[float] = None) -> "VectorIndex":
        with open(os.path.join(directory, f"{name}.manifest.json")) as fh:
            manifest = json.load(fh)
        with np.load(os.path.join(directory, f"{name}.npz")) as data:
            # ids embedded in the npz commit atomically with the embeddings;
            # the manifest is only the legacy fallback (pre-atomic snapshots)
            if "chunk_ids" in data:
                chunk_ids = data["chunk_ids"].tolist()
                user_ids = data["user_ids"].tolist()
                document_ids = data["document_ids"].tolist()
            else:
                chunk_ids = manifest["chunk_ids"]
                user_ids = manifest["user_ids"]
                document_ids = manifest["document_ids"]
            warm_centroids = (
                np.asarray(data["ivf_centroids"]) if "ivf_centroids" in data
                else None
            )
            pq_books = (
                np.asarray(data["pq_codebooks"]) if "pq_codebooks" in data
                else None
            )
            pq_codes = (
                np.asarray(data["pq_codes"]) if "pq_codes" in data else None
            )
            if "embeddings_int8" in data and dtype == "int8":
                index = cls(dim=manifest["dim"], dtype=dtype, backend=backend,
                            ivf_nprobe=ivf_nprobe, ivf_min_rows=ivf_min_rows,
                            ivf_min_structure=ivf_min_structure, mesh=mesh,
                            pq_m=pq_m, pq_refine=pq_refine,
                            pq_residual=pq_residual,
                            pq_min_quality=pq_min_quality)
                index._install_prequantized(
                    chunk_ids, user_ids, document_ids,
                    data["embeddings_int8"], data["scales"],
                )
                index._ivf_warm_centroids = warm_centroids
                index._loaded_snapshot_seq = int(manifest.get("snapshot_seq", 0))
                return index
            if "embeddings_int8" in data:  # dtype changed between runs
                mat = data["embeddings_int8"].astype(np.float32) * data["scales"][:, None]
            elif "embeddings_bf16" in data:
                mat = native.bf16_to_f32(data["embeddings_bf16"])
            else:
                mat = data["embeddings"]
        if len(chunk_ids) != len(mat):
            raise ValueError(
                f"{name}: snapshot ids ({len(chunk_ids)}) and embeddings "
                f"({len(mat)}) disagree — refusing to zip mismatched rows"
            )
        index = cls(dim=manifest["dim"], dtype=dtype, backend=backend,
                    ivf_nprobe=ivf_nprobe, ivf_min_rows=ivf_min_rows,
                    ivf_min_structure=ivf_min_structure, mesh=mesh,
                    pq_m=pq_m, pq_refine=pq_refine, pq_residual=pq_residual,
                    pq_min_quality=pq_min_quality)
        if (index.is_pq and pq_books is not None and pq_codes is not None
                and len(pq_codes) == len(chunk_ids)
                and pq_codes.shape[1] == index.pq_m):
            # warm restart: install persisted codebooks + codes directly.
            # A pq_m changed between runs falls through to the re-upsert
            # path below, which retrains at the new m.
            index._install_precoded(
                chunk_ids, user_ids, document_ids, mat, pq_books, pq_codes
            )
            index._ivf_warm_centroids = warm_centroids
            index._loaded_snapshot_seq = int(manifest.get("snapshot_seq", 0))
            return index
        rows = [
            VectorRow(
                chunk_id=c, user_id=u, document_id=d,
                modality="text" if manifest["dim"] != 512 else "image", embedding=e,
            )
            for c, u, d, e in zip(chunk_ids, user_ids, document_ids, mat)
        ]
        if rows:
            index.upsert(rows)
        index._ivf_warm_centroids = warm_centroids
        index._loaded_snapshot_seq = int(manifest.get("snapshot_seq", 0))
        return index

    @classmethod
    def load_or_create(
        cls, directory: str, name: str, dim: int, dtype: str = "bfloat16",
        backend: str = "auto", ivf_nprobe: Optional[int] = None,
        ivf_min_rows: Optional[int] = None,
        ivf_min_structure: Optional[float] = None, mesh=None,
        pq_m: Optional[int] = None, pq_refine: Optional[int] = None,
        pq_residual: Optional[bool] = None,
        pq_min_quality: Optional[float] = None,
    ) -> "VectorIndex":
        if os.path.exists(os.path.join(directory, f"{name}.manifest.json")):
            return cls.load(directory, name, dtype, backend,
                            ivf_nprobe=ivf_nprobe, ivf_min_rows=ivf_min_rows,
                            ivf_min_structure=ivf_min_structure, mesh=mesh,
                            pq_m=pq_m, pq_refine=pq_refine,
                            pq_residual=pq_residual,
                            pq_min_quality=pq_min_quality)
        return cls(dim=dim, dtype=dtype, backend=backend,
                   ivf_nprobe=ivf_nprobe, ivf_min_rows=ivf_min_rows,
                   ivf_min_structure=ivf_min_structure, mesh=mesh,
                   pq_m=pq_m, pq_refine=pq_refine, pq_residual=pq_residual,
                   pq_min_quality=pq_min_quality)
