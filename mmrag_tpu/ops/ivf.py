"""IVF (inverted-file) ANN: k-means partitions + static-shape probing.

TPU-native fulfilment of the reference's IVF role (LanceDB IVF_PQ, 32
partitions, ``/root/reference/app/storage/lancedb_store.py:51-58``) — but
designed for the hardware instead of translated:

  * k-means runs entirely on the MXU: the assignment step is one
    ``(n, d) x (d, C)`` matmul + argmax, the update step a ``segment_sum``;
    a handful of Lloyd iterations compile to one jitted step reused across
    the Python loop.
  * the cluster layout is a dense ``(C, B, d)`` bucket tensor (B = padded
    per-cluster capacity), so probing ``nprobe`` clusters is a static-shape
    gather + one matmul — no ragged lists, no recompiles, no host round
    trips. Overflow rows that don't fit their bucket go to a ``spill`` slab
    that is scored densely on every query (exactly), so imbalanced clusters
    degrade *cost*, never correctness-of-membership.
  * searches return global row indices compatible with the flat slab, so
    tombstone/tenant masks apply unchanged (mask lookup by row id).

Recall is governed by ``nprobe`` (probed fraction = nprobe/C); rows in the
spill slab and any post-build append tail (handled by the caller, see
``VectorIndex``) are scored exactly. Measured @1M x 384 on v5e: see
KERNELS.md / BASELINE.md.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .topk import NEG_INF, l2_normalize, merge_topk, pad_topk as _pad_k


# ---------------------------------------------------------------------------
# k-means (cosine/spherical: rows and centroids stay L2-normalized)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _kmeans_step(rows: jnp.ndarray, centroids: jnp.ndarray, n_clusters: int):
    scores = jnp.dot(
        rows, centroids.T.astype(rows.dtype), preferred_element_type=jnp.float32
    )
    assign = jnp.argmax(scores, axis=1)
    sums = jax.ops.segment_sum(rows.astype(jnp.float32), assign, n_clusters)
    counts = jax.ops.segment_sum(jnp.ones((rows.shape[0],), jnp.float32), assign, n_clusters)
    fresh = sums / jnp.maximum(counts[:, None], 1.0)
    # empty clusters keep their previous centroid instead of collapsing to 0
    new_c = jnp.where(counts[:, None] > 0, l2_normalize(fresh), centroids)
    return new_c, assign


@functools.partial(jax.jit, static_argnames=())
def _assign_int8(rows_q: jnp.ndarray, centroids: jnp.ndarray, scales: jnp.ndarray):
    """Assignment + structure for an int8 slab without dequantizing it.

    argmax is scale-invariant (per-row scales are positive), so the raw
    integer dot picks the same centroid the dequantized rows would; only the
    structure statistic needs the scale applied (per-row max, not per-cell).
    """

    scores = jnp.dot(
        rows_q.astype(jnp.bfloat16),  # int8 values are exact in bf16
        centroids.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    best = jnp.max(scores, axis=1)
    return jnp.argmax(scores, axis=1).astype(jnp.int32), jnp.mean(best * scales)


def _even_indices(n: int, count: int) -> np.ndarray:
    """``count`` evenly spaced row indices over ``[0, n)`` — deterministic,
    spans the whole insertion order, and (unlike any integer stride) keeps
    the full sample size for every n > count. Distinct for count <= n
    (spacing >= 1)."""

    return np.linspace(0, n - 1, num=count).astype(np.int32)


def kmeans(
    rows: jnp.ndarray,  # (n, d), L2-normalized, f32/bf16
    n_clusters: int,
    iters: int = 8,
    train_sample: int = 0,  # 0 = train on all rows; else strided sample cap
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spherical k-means; returns (centroids (C, d) f32, assign (n,) int32).

    Init is strided row sampling (deterministic, spread across insertion
    order). Each Lloyd iteration is one compiled step. With ``train_sample``,
    Lloyd runs on a strided subsample (the standard IVF training recipe —
    LanceDB/faiss train on a fraction too) and only the final assignment
    touches every row, bounding build-time HBM traffic at large n."""

    n = rows.shape[0]
    train = rows
    if train_sample and n > train_sample:
        # evenly spaced indices: spans the WHOLE corpus (a floor stride
        # trains on a first-rows prefix — insertion order is per-tenant, so
        # a late tenant's geometry would go unseen) at the FULL sample size
        # (a ceil stride halves the sample just past the cap)
        train = rows[_even_indices(n, train_sample)]
    tn = train.shape[0]
    stride = max(tn // n_clusters, 1)
    centroids = l2_normalize(train[::stride][:n_clusters].astype(jnp.float32))
    if centroids.shape[0] < n_clusters:  # n < C: pad by wrapping
        reps = -(-n_clusters // centroids.shape[0])
        centroids = jnp.tile(centroids, (reps, 1))[:n_clusters]
    for _ in range(max(iters, 1)):
        centroids, _ = _kmeans_step(train, centroids, n_clusters)
    # final assignment of EVERY row against the final centroids (the loop's
    # assign lags one update behind and covers only the training sample)
    assign, _ = _assign_with_structure(rows, centroids)
    return centroids, assign


@functools.partial(jax.jit, static_argnames=())
def _assign_with_structure(rows: jnp.ndarray, centroids: jnp.ndarray):
    """Final assignment + mean best-cosine ("structure") in one matmul pass.

    The structure statistic is the clusterability signal behind the auto-
    routing knob (VERDICT r1 item 7): for structureless data (uniform on the
    d-sphere) the expected best-of-C cosine is ~sqrt(2 ln C / d); genuinely
    clustered embedding corpora score several times that."""

    scores = jnp.dot(
        rows, centroids.T.astype(rows.dtype), preferred_element_type=jnp.float32
    )
    return jnp.argmax(scores, axis=1).astype(jnp.int32), jnp.mean(jnp.max(scores, axis=1))


def structureless_baseline(n_clusters: int, d: int) -> float:
    """Expected best-of-C assignment cosine for uniform rows on the d-sphere."""

    return float(np.sqrt(2.0 * np.log(max(n_clusters, 2)) / d))


def default_n_clusters(n: int) -> int:
    """sqrt scaling keeps probe cost ~ O(sqrt n): 1M -> 2048 clusters."""

    return max(8, min(1 << int(np.ceil(np.log2(max(np.sqrt(n) * 2, 8)))), n))


def bucket_size(n: int, n_clusters: int, bucket_factor: float) -> int:
    """Bucket capacity: factor x mean cluster size, lane-aligned (128) so
    the Pallas probe kernel stays eligible; tiny indexes need only
    sublane alignment."""

    bucket = int(-(-n * bucket_factor // n_clusters))
    align = 128 if bucket >= 64 else 8
    return max(8, (bucket + align - 1) // align * align)


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------


@dataclass
class IVFData:
    """Device-resident IVF layout over a flat row slab.

    Tenant/document/liveness predicates are carried in bucket layout
    (``*_b`` and ``spill_*``) so the probe kernel evaluates them in-place —
    XLA's element gather for ``mask[row_ids]`` measured ~0.3 ms/query at 1M
    rows. users/docs are immutable per row; liveness changes flow in through
    :meth:`mark_dead` (tombstones), keyed by the host-side
    ``slot_of_row`` map."""

    centroids: jnp.ndarray  # (C, d) f32
    buckets: jnp.ndarray  # (C, B, d) slab dtype
    bucket_ids: jnp.ndarray  # (C, 1, B) int32 global row index, -1 = empty
    users_b: jnp.ndarray  # (C, 1, B) int32 tenant id per slot
    docs_b: jnp.ndarray  # (C, 1, B) int32 document id per slot
    live_b: jnp.ndarray  # (C, 1, B) int32 0/1
    spill: jnp.ndarray  # (S, d) overflow rows, scored densely (S may be 0)
    spill_ids: jnp.ndarray  # (S,) int32
    spill_users: jnp.ndarray  # (S,) int32
    spill_docs: jnp.ndarray  # (S,) int32
    spill_live: jnp.ndarray  # (S,) int32
    slot_of_row: np.ndarray  # host (built_rows, 2): (cluster, slot); (-1, s) = spill
    built_rows: int  # rows [0, built_rows) are covered by this layout
    # int8 storage mode (the "PQ" half of the reference's IVF_PQ,
    # lancedb_store.py:51-58): buckets/spill hold quantized rows and these
    # carry the per-slot dequantization scales. None = full-precision layout.
    scales_b: Optional[jnp.ndarray] = None  # (C, 1, B) f32
    spill_scales: Optional[jnp.ndarray] = None  # (S,) f32
    # product-quantized layout (the reference's LITERAL IVF_PQ: partitioned
    # AND num_sub_vectors-coded): buckets/spill hold m-byte ADC codes and
    # this carries the codebooks that encoded them (a snapshot — the owning
    # index may retrain its live codebooks later; probe scoring MUST use
    # these so bucket codes decode in their own quantization).
    pq_codebooks: Optional[jnp.ndarray] = None  # (m, K, ds) f32
    # mean best-assignment cosine at build time — the clusterability signal
    # the owning index compares against structureless_baseline() to decide
    # whether this layout is worth probing at all (VERDICT r1 item 7)
    structure: float = 0.0
    # residual coding (the FAISS/LanceDB IVF_PQ convention): bucket/spill
    # codes encode x - centroid[assign] instead of x, so the per-subvector
    # codebooks spend their 256 centroids on the WITHIN-cluster geometry the
    # raw coding blurs (cosine decomposes: q.x = q.c + q.r, so scoring adds
    # the query-centroid dot — already computed for probe selection — back
    # as a per-bucket offset). spill_assign carries each spill row's cluster
    # id for that offset.
    pq_residual: bool = False
    spill_assign: Optional[jnp.ndarray] = None  # (S,) int32

    @property
    def is_pq(self) -> bool:
        return self.pq_codebooks is not None

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def bucket_size(self) -> int:
        return int(self.buckets.shape[1])

    def mark_dead(self, rows: np.ndarray) -> None:
        """Tombstone clustered/spilled rows (called by the owning index)."""

        rows = np.asarray(rows)
        rows = rows[rows < self.built_rows]
        if rows.size == 0:
            return
        slots = self.slot_of_row[rows]
        bucketed = slots[slots[:, 0] >= 0]
        spilled = slots[slots[:, 0] < 0]
        if bucketed.size:
            self.live_b = self.live_b.at[
                jnp.asarray(bucketed[:, 0]), 0, jnp.asarray(bucketed[:, 1])
            ].set(0)
        if spilled.size:
            self.spill_live = self.spill_live.at[jnp.asarray(spilled[:, 1])].set(0)


def build_ivf(
    slab_rows: jnp.ndarray,  # (n, d) L2-normalized rows (a slab prefix)
    n_clusters: Optional[int] = None,
    bucket_factor: float = 1.5,
    iters: int = 8,
    users: Optional[jnp.ndarray] = None,  # (n,) int32 tenant ids
    docs: Optional[jnp.ndarray] = None,  # (n,) int32 document ids
    live: Optional[jnp.ndarray] = None,  # (n,) bool/int
    scales: Optional[jnp.ndarray] = None,  # (n,) f32: slab_rows is int8
    train_sample: int = 131072,
    centroids: Optional[jnp.ndarray] = None,  # (C, d): warm rebuild, no Lloyd
    assign: Optional[np.ndarray] = None,  # (n,) precomputed assignment
    structure_override: Optional[float] = None,  # with `assign`
    pq_codebooks: Optional[jnp.ndarray] = None,  # slab_rows are ADC codes
    pq_residual: bool = False,  # codes encode x - centroid[assign]
) -> IVFData:
    """Cluster rows and lay them out in fixed-size buckets.

    Row *data* never leaves the device: the host handles only int32 slot
    bookkeeping (which row lands in which bucket slot), then one device
    gather materializes the bucket tensor. ``bucket_factor`` scales bucket
    capacity above the mean cluster size; rows beyond capacity spill.
    Predicate arrays default to a single tenant/document, all live.

    With ``scales`` the slab is int8 (``TPU_INDEX_DTYPE=int8`` composing with
    the ivf backend — the reference's partitioned *and* compressed IVF_PQ
    design point): k-means trains on a dequantized strided sample, every-row
    assignment uses the raw integer dot (argmax is invariant to the positive
    per-row scale), and the bucket tensor keeps the rows quantized with the
    scales gathered alongside — HBM per row stays halved vs bf16.

    With ``pq_codebooks`` the slab is the (n, m) int8 ADC code matrix (the
    literal IVF_PQ: partitioned AND product-quantized). Codes carry no
    usable geometry for clustering, so the caller precomputes the
    assignment against the f32 ORIGINALS (host-resident in pq mode,
    chunk-pushed to the device) and passes it via ``assign`` +
    ``centroids`` + ``structure_override``; this function only does the
    layout — slot bookkeeping on host, bucket gather of codes on device.
    """

    n, d = slab_rows.shape
    if pq_codebooks is not None and (assign is None or centroids is None):
        raise ValueError(
            "pq layout needs a precomputed assignment + centroids "
            "(codes carry no clustering geometry)"
        )
    if pq_residual and pq_codebooks is None:
        raise ValueError("pq_residual requires pq_codebooks")
    if users is None:
        users = jnp.zeros((n,), jnp.int32)
    if docs is None:
        docs = jnp.zeros((n,), jnp.int32)
    if live is None:
        live = jnp.ones((n,), jnp.int32)
    users = jnp.asarray(users, jnp.int32)
    docs = jnp.asarray(docs, jnp.int32)
    live = jnp.asarray(live).astype(jnp.int32)
    if n_clusters is None:
        n_clusters = default_n_clusters(n)
    bucket = bucket_size(n, n_clusters, bucket_factor)

    if assign is not None:
        # precomputed assignment (pq layout, or any caller that clustered
        # out-of-band): no Lloyd, no assignment matmul — layout only
        centroids = jnp.asarray(centroids, jnp.float32)
        n_clusters = int(centroids.shape[0])
        structure = (
            0.0 if structure_override is None else float(structure_override)
        )
        bucket = bucket_size(n, n_clusters, bucket_factor)
    elif centroids is not None:
        # warm rebuild from persisted centroids: skip Lloyd entirely; only
        # the single assignment matmul runs (restart path — VectorIndex
        # snapshots carry the centroids)
        centroids = jnp.asarray(centroids, jnp.float32)
        n_clusters = int(centroids.shape[0])
        if scales is not None:
            scales = jnp.asarray(scales, jnp.float32)
            assign, structure = _assign_int8(slab_rows, centroids, scales)
        else:
            assign, structure = _assign_with_structure(slab_rows, centroids)
        bucket = bucket_size(n, n_clusters, bucket_factor)
    elif scales is not None:
        scales = jnp.asarray(scales, jnp.float32)
        # train on a dequantized sample only (bounded f32 materialization);
        # evenly spaced so it spans insertion order at the full sample size
        cap = min(train_sample or n, n)
        sel = _even_indices(n, cap)
        sample = (slab_rows[sel].astype(jnp.float32)
                  * scales[sel, None])
        centroids, _ = kmeans(sample, n_clusters, iters, train_sample=0)
        assign, structure = _assign_int8(slab_rows, centroids, scales)
    else:
        centroids, _ = kmeans(slab_rows, n_clusters, iters, train_sample=train_sample)
        assign, structure = _assign_with_structure(slab_rows, centroids)
    structure = float(structure)
    assign_h = np.asarray(assign)

    # host-side slot assignment (vectorized int bookkeeping only): stable
    # sort by cluster preserves insertion order within each bucket
    ids = np.full((n_clusters, bucket), -1, np.int32)
    order = np.argsort(assign_h, kind="stable").astype(np.int32)
    sorted_assign = assign_h[order]
    starts = np.searchsorted(sorted_assign, np.arange(n_clusters))
    pos = np.arange(n) - starts[sorted_assign]
    fits = pos < bucket
    ids[sorted_assign[fits], pos[fits]] = order[fits]
    spill_ids = order[~fits]
    pad_spill = max(8, (len(spill_ids) + 7) // 8 * 8) if len(spill_ids) else 0
    if pad_spill:
        spill_ids = np.pad(spill_ids, (0, pad_spill - len(spill_ids)), constant_values=-1)

    slot_of_row = np.full((n, 2), -1, np.int32)
    slot_of_row[order[fits], 0] = sorted_assign[fits]
    slot_of_row[order[fits], 1] = pos[fits]
    if len(spill_ids):
        real_spill = spill_ids[spill_ids >= 0] if pad_spill else spill_ids
        slot_of_row[order[~fits], 1] = np.arange(len(real_spill), dtype=np.int32)

    ids_dev = jnp.asarray(ids)
    clipped = jnp.clip(ids_dev, 0, n - 1)
    in_slot = ids_dev >= 0
    buckets = jnp.where(
        in_slot[..., None], slab_rows[clipped], jnp.zeros((), slab_rows.dtype)
    )
    users_b = jnp.where(in_slot, users[clipped], -1).reshape(n_clusters, 1, bucket)
    docs_b = jnp.where(in_slot, docs[clipped], -1).reshape(n_clusters, 1, bucket)
    live_b = jnp.where(in_slot, live[clipped], 0).reshape(n_clusters, 1, bucket)
    scales_b = None
    if scales is not None:
        scales_b = jnp.where(in_slot, scales[clipped], 1.0).reshape(
            n_clusters, 1, bucket
        )
    spill_scales = None
    if pad_spill:
        sid_dev = jnp.asarray(spill_ids)
        sclip = jnp.clip(sid_dev, 0, n - 1)
        s_in = sid_dev >= 0
        spill = jnp.where(
            s_in[:, None], slab_rows[sclip], jnp.zeros((), slab_rows.dtype)
        )
        spill_users = jnp.where(s_in, users[sclip], -1)
        spill_docs = jnp.where(s_in, docs[sclip], -1)
        spill_live = jnp.where(s_in, live[sclip], 0)
        spill_assign = jnp.where(s_in, jnp.asarray(assign_h)[sclip], 0)
        if scales is not None:
            spill_scales = jnp.where(s_in, scales[sclip], 1.0)
    else:
        sid_dev = jnp.zeros((0,), jnp.int32)
        spill = jnp.zeros((0, d), slab_rows.dtype)
        spill_users = spill_docs = spill_live = jnp.zeros((0,), jnp.int32)
        spill_assign = jnp.zeros((0,), jnp.int32)
        if scales is not None:
            spill_scales = jnp.zeros((0,), jnp.float32)

    return IVFData(
        centroids=centroids,
        buckets=buckets,
        bucket_ids=ids_dev.reshape(n_clusters, 1, bucket),
        users_b=users_b,
        docs_b=docs_b,
        live_b=live_b,
        spill=spill,
        spill_ids=sid_dev,
        spill_users=spill_users,
        spill_docs=spill_docs,
        spill_live=spill_live,
        slot_of_row=slot_of_row,
        built_rows=n,
        scales_b=scales_b,
        spill_scales=spill_scales,
        pq_codebooks=(
            jnp.asarray(pq_codebooks, jnp.float32)
            if pq_codebooks is not None else None
        ),
        structure=structure,
        pq_residual=bool(pq_residual),
        spill_assign=spill_assign.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Pallas probe kernel (scalar-prefetch data-dependent DMA)
# ---------------------------------------------------------------------------
#
# XLA lowers ``buckets[probes]`` (a (nprobe, B, d) gather from (C, B, d)) to
# a row-wise gather measured at ~3.8 ms for 37 MB of probed data on v5e —
# 60x over the DMA floor. The kernel fixes it with scalar prefetch: the
# probe ids arrive before the body runs, the BlockSpec index_map reads them,
# and the pipeline DMAs exactly the probed (B, d) blocks while the MXU dots
# the previous one. Row ids ride along as a second gathered output.


def _probe_kernel(probe_ref, uid_ref, did_ref, q_ref, bucket_ref, ids_ref,
                  users_ref, docs_ref, live_ref, scores_ref, ids_out_ref):
    from jax.experimental import pallas as pl

    del probe_ref  # consumed by the index_maps
    qi = pl.program_id(0)
    uid = uid_ref[qi]
    did = did_ref[qi]
    scores = jax.lax.dot_general(
        q_ref[0],  # (1, d): query row selected by the BlockSpec index_map
        bucket_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, B)
    valid = (
        (live_ref[0, 0] != 0)
        & (users_ref[0, 0] == uid)
        & ((did < 0) | (docs_ref[0, 0] == did))
    )
    scores_ref[0, 0, 0, :] = jnp.where(valid, scores[0], jnp.float32(-1e30))
    ids_out_ref[0, 0, 0, :] = ids_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_probe_scores(
    queries: jnp.ndarray,  # (q, d) f32
    buckets: jnp.ndarray,  # (C, B, d)
    bucket_ids: jnp.ndarray,  # (C, 1, B) int32
    users_b: jnp.ndarray,  # (C, 1, B) int32
    docs_b: jnp.ndarray,  # (C, 1, B) int32
    live_b: jnp.ndarray,  # (C, 1, B) int32
    probes: jnp.ndarray,  # (q, nprobe) int32
    uids: jnp.ndarray,  # (q,) int32 tenant predicate per query
    dids: jnp.ndarray,  # (q,) int32 document predicate (-1 = none)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked probe scores + row ids, each (q, nprobe, B).

    The tenant/doc/live predicate evaluates *inside* the kernel on the
    bucket-layout predicate planes — no element gather ever touches the
    (n,)-indexed masks. Block shapes obey Mosaic's last-two-dims rule by
    keeping singleton axes second-minor (queries (q, 1, d), planes
    (C, 1, B), outputs (q, nprobe, 1, B)); the query row is selected by the
    BlockSpec index_map, never by in-kernel dynamic slicing (unsupported).
    """

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qn, d = queries.shape
    _, bucket, _ = buckets.shape
    nprobe = probes.shape[1]

    def by_probe(qi, i, probe_ref, uid_ref, did_ref):
        return (probe_ref[qi, i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(qn, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda qi, i, p, u, dd: (qi, 0, 0)),
            pl.BlockSpec((1, bucket, d), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, bucket), lambda qi, i, p, u, dd: (qi, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, bucket), lambda qi, i, p, u, dd: (qi, i, 0, 0)),
        ],
    )
    scores4, ids4 = pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn, nprobe, 1, bucket), jnp.float32),
            jax.ShapeDtypeStruct((qn, nprobe, 1, bucket), jnp.int32),
        ],
        interpret=interpret,
    )(probes, uids, dids, queries.astype(buckets.dtype).reshape(qn, 1, d),
      buckets, bucket_ids, users_b, docs_b, live_b)
    return scores4[:, :, 0, :], ids4[:, :, 0, :]


def _probe_kernel_q(probe_ref, uid_ref, did_ref, q_ref, bucket_ref, scales_ref,
                    ids_ref, users_ref, docs_ref, live_ref,
                    scores_ref, ids_out_ref):
    """int8-bucket variant of :func:`_probe_kernel`: the block arrives
    quantized (halved DMA bytes — the probe is bandwidth-bound), the dot runs
    in bf16 (int8 values are exact in bf16, accumulation is f32, so the
    integer dot is exact), and the per-slot dequant scale applies to the
    score row. Masked slots get -inf (not -1e30) because the caller still
    multiplies by the positive per-query quantization scale."""

    from jax.experimental import pallas as pl

    del probe_ref
    qi = pl.program_id(0)
    uid = uid_ref[qi]
    did = did_ref[qi]
    raw = jax.lax.dot_general(
        q_ref[0],  # (1, d) bf16 quantized query values
        bucket_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, B)
    scores = raw[0] * scales_ref[0, 0]
    valid = (
        (live_ref[0, 0] != 0)
        & (users_ref[0, 0] == uid)
        & ((did < 0) | (docs_ref[0, 0] == did))
    )
    scores_ref[0, 0, 0, :] = jnp.where(valid, scores, -jnp.inf)
    ids_out_ref[0, 0, 0, :] = ids_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_probe_scores_q(
    queries_q: jnp.ndarray,  # (q, d) bf16 — quantized query VALUES (ints)
    buckets: jnp.ndarray,  # (C, B, d) int8
    scales_b: jnp.ndarray,  # (C, 1, B) f32 per-slot dequant scales
    bucket_ids: jnp.ndarray,
    users_b: jnp.ndarray,
    docs_b: jnp.ndarray,
    live_b: jnp.ndarray,
    probes: jnp.ndarray,
    uids: jnp.ndarray,
    dids: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked probe over quantized buckets; returns row-scaled scores (the
    caller applies the per-query quantization scale) + row ids."""

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qn, d = queries_q.shape
    _, bucket, _ = buckets.shape
    nprobe = probes.shape[1]

    def by_probe(qi, i, probe_ref, uid_ref, did_ref):
        return (probe_ref[qi, i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(qn, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda qi, i, p, u, dd: (qi, 0, 0)),
            pl.BlockSpec((1, bucket, d), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
            pl.BlockSpec((1, 1, bucket), by_probe),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, bucket), lambda qi, i, p, u, dd: (qi, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, bucket), lambda qi, i, p, u, dd: (qi, i, 0, 0)),
        ],
    )
    scores4, ids4 = pl.pallas_call(
        _probe_kernel_q,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn, nprobe, 1, bucket), jnp.float32),
            jax.ShapeDtypeStruct((qn, nprobe, 1, bucket), jnp.int32),
        ],
        interpret=interpret,
    )(probes, uids, dids, queries_q.reshape(qn, 1, d),
      buckets, scales_b, bucket_ids, users_b, docs_b, live_b)
    return scores4[:, :, 0, :], ids4[:, :, 0, :]


def _use_pallas_probe(bucket: int, d: int, itemsize: int = 2) -> bool:
    import jax as _jax

    return (
        bucket % 128 == 0
        and d % 128 == 0
        and bucket * d * itemsize <= 6 * 1024 * 1024  # VMEM block budget
        and _jax.default_backend() == "tpu"
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_probe(
    queries: jnp.ndarray,  # (q, d) f32 normalized
    centroids: jnp.ndarray,
    buckets: jnp.ndarray,
    bucket_ids: jnp.ndarray,  # (C, 1, B)
    row_mask: jnp.ndarray,  # (n,) or (q, n) bool over GLOBAL row ids
    k: int,
    nprobe: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generic-mask probe (XLA gather path; CPU / arbitrary row masks)."""

    qn, d = queries.shape
    dtype = buckets.dtype
    cscores = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(cscores, nprobe)  # (q, nprobe)

    mask2d = row_mask if row_mask.ndim == 2 else jnp.broadcast_to(row_mask[None], (qn, row_mask.shape[0]))

    def per_query(qvec, probe, rmask):
        sub = buckets[probe]  # (nprobe, B, d) gather
        ids = bucket_ids[probe].reshape(-1)  # (nprobe*B,)
        flat = sub.reshape(-1, d)
        scores = jnp.dot(
            flat, qvec.astype(dtype), preferred_element_type=jnp.float32
        )
        valid = (ids >= 0) & rmask[jnp.clip(ids, 0, None)]
        scores = jnp.where(valid, scores, NEG_INF)
        s, sel = jax.lax.top_k(scores, k)
        return s, ids[sel]

    return jax.vmap(per_query)(queries.astype(jnp.float32), probes, mask2d)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "use_pallas"))
def _ivf_probe_pred(
    queries: jnp.ndarray,  # (q, d) f32 normalized
    centroids: jnp.ndarray,
    buckets: jnp.ndarray,
    bucket_ids: jnp.ndarray,  # (C, 1, B)
    users_b: jnp.ndarray,
    docs_b: jnp.ndarray,
    live_b: jnp.ndarray,
    uids: jnp.ndarray,  # (q,) int32
    dids: jnp.ndarray,  # (q,) int32, -1 = no document filter
    k: int,
    nprobe: int,
    use_pallas: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tenant/doc/live-predicated probe; masking happens in bucket layout
    (inside the kernel on TPU), so no (n,)-indexed gather exists anywhere."""

    qn, d = queries.shape
    cscores = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(cscores, nprobe)  # (q, nprobe)

    if use_pallas:
        s3, i3 = pallas_probe_scores(
            queries, buckets, bucket_ids, users_b, docs_b, live_b,
            probes, uids, dids,
        )
        scores = s3.reshape(qn, -1)
        ids = i3.reshape(qn, -1)
    else:  # XLA fallback: gather the (small) predicate planes per probe
        def per_query(qvec, probe, uid, did):
            sub = buckets[probe].reshape(-1, d)
            ids = bucket_ids[probe].reshape(-1)
            s = jnp.dot(sub, qvec.astype(buckets.dtype),
                        preferred_element_type=jnp.float32)
            valid = (
                (live_b[probe].reshape(-1) != 0)
                & (users_b[probe].reshape(-1) == uid)
                & ((did < 0) | (docs_b[probe].reshape(-1) == did))
            )
            return jnp.where(valid, s, NEG_INF), ids

        scores, ids = jax.vmap(per_query)(
            queries.astype(jnp.float32), probes, uids, dids)
    s, sel = jax.lax.top_k(scores, k)
    return s, jnp.take_along_axis(ids, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "use_pallas"))
def _ivf_probe_pred_q(
    queries: jnp.ndarray,  # (q, d) f32 normalized
    centroids: jnp.ndarray,
    buckets: jnp.ndarray,  # (C, B, d) int8
    scales_b: jnp.ndarray,  # (C, 1, B) f32
    bucket_ids: jnp.ndarray,
    users_b: jnp.ndarray,
    docs_b: jnp.ndarray,
    live_b: jnp.ndarray,
    uids: jnp.ndarray,
    dids: jnp.ndarray,
    k: int,
    nprobe: int,
    use_pallas: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predicated probe over QUANTIZED buckets. Queries quantize exactly as
    the dense int8 path (:func:`mmrag_tpu.ops.topk._cosine_topk_int8`), so
    probe / spill / append-tail scores agree bit-for-bit and merge cleanly."""

    from .topk import quantize_rows_int8

    qn, d = queries.shape
    cscores = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(cscores, nprobe)

    qq, qscale = quantize_rows_int8(queries.astype(jnp.float32))
    q_bf = qq.astype(jnp.bfloat16)  # int8 values exact in bf16

    if use_pallas:
        s3, i3 = pallas_probe_scores_q(
            q_bf, buckets, scales_b, bucket_ids, users_b, docs_b, live_b,
            probes, uids, dids,
        )
        scores = s3.reshape(qn, -1) * qscale[:, None]
        ids = i3.reshape(qn, -1)
    else:  # XLA fallback: gather probed blocks, dequant after the dot
        def per_query(qvec_bf, qs, probe, uid, did):
            sub = buckets[probe].reshape(-1, d)
            ids = bucket_ids[probe].reshape(-1)
            raw = jnp.dot(sub.astype(jnp.bfloat16), qvec_bf,
                          preferred_element_type=jnp.float32)
            s = raw * scales_b[probe].reshape(-1) * qs
            valid = (
                (live_b[probe].reshape(-1) != 0)
                & (users_b[probe].reshape(-1) == uid)
                & ((did < 0) | (docs_b[probe].reshape(-1) == did))
            )
            return jnp.where(valid, s, NEG_INF), ids

        scores, ids = jax.vmap(per_query)(q_bf, qscale, probes, uids, dids)
    s, sel = jax.lax.top_k(scores, k)
    return s, jnp.take_along_axis(ids, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "residual"))
def _ivf_probe_pred_adc(
    queries: jnp.ndarray,  # (q, d) f32 normalized (probe selection only)
    tables: jnp.ndarray,  # (m, q, K) bf16 per-query ADC tables
    centroids: jnp.ndarray,
    buckets: jnp.ndarray,  # (C, B, m) int8 ADC codes
    bucket_ids: jnp.ndarray,
    users_b: jnp.ndarray,
    docs_b: jnp.ndarray,
    live_b: jnp.ndarray,
    uids: jnp.ndarray,
    dids: jnp.ndarray,
    k: int,
    nprobe: int,
    residual: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predicated probe over PQ-CODED buckets (the literal IVF_PQ): probed
    slots score by ADC against the layout's own codebook tables
    (``ops.pq._adc_tables`` of ``IVFData.pq_codebooks``, bf16 — the same
    rounding every flat pq path uses, so probe / spill / tail scores merge
    on one scale). Bucket fetch is block-granular XLA (q*nprobe contiguous
    (B, m) blocks — cheap); SCORING goes through the shared one-hot MXU
    rescore kernel: the old per-query table-lookup loop paid q*nprobe*B*m
    per-element gathers, 136 ms @1M (nprobe 64, B 512, q 16) where the
    kernel form measures ~2 ms.

    With ``residual`` the codes encode ``x - centroid`` and the probe
    scores add back the query-centroid dot already computed for probe
    selection — one broadcast add, no extra matmul."""

    from .pq import adc_rescore_scores

    q, B, m = queries.shape[0], buckets.shape[1], buckets.shape[2]
    cscores = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    cvals, probes = jax.lax.top_k(cscores, nprobe)  # (q, nprobe) values + ids

    flat = probes.reshape(-1)
    S = nprobe * B
    cand = (
        jnp.take(buckets, flat, axis=0)
        .reshape(q, S, m)
        .transpose(0, 2, 1)  # (q, m, S) lane-major for the kernel
    )
    ids = jnp.take(bucket_ids, flat, axis=0).reshape(q, S)
    live = jnp.take(live_b, flat, axis=0).reshape(q, S)
    users = jnp.take(users_b, flat, axis=0).reshape(q, S)
    docs = jnp.take(docs_b, flat, axis=0).reshape(q, S)
    valid = (
        (live != 0)
        & (users == uids[:, None])
        & ((dids[:, None] < 0) | (docs == dids[:, None]))
    )
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)

    scores = adc_rescore_scores(tables, cand, bias)
    if residual:
        # top_k already returned the probed centroids' query dots — they ARE
        # the residual offsets, no re-gather needed
        scores = scores + jnp.broadcast_to(
            cvals[:, :, None], (q, nprobe, B)
        ).reshape(q, S)
    s, sel = jax.lax.top_k(scores, min(k, S))
    ids = jnp.take_along_axis(ids, sel, axis=1)
    if s.shape[1] < k:  # degenerate tiny layouts: pad to the contract shape
        pad = k - s.shape[1]
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=float(NEG_INF))
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return s, ids


@functools.partial(jax.jit, static_argnames=("k",))
def _spill_scores_pred_adc(
    tables: jnp.ndarray,  # (m, q, K) bf16
    spill: jnp.ndarray,  # (S, m) int8 codes
    spill_ids: jnp.ndarray,
    spill_users: jnp.ndarray,
    spill_docs: jnp.ndarray,
    spill_live: jnp.ndarray,
    uids: jnp.ndarray,
    dids: jnp.ndarray,
    k: int,
    queries: Optional[jnp.ndarray] = None,  # residual layout: (q, d) f32
    centroids: Optional[jnp.ndarray] = None,  # residual layout: (C, d) f32
    spill_assign: Optional[jnp.ndarray] = None,  # residual layout: (S,) int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from .pq import adc_rescore_scores

    qn = tables.shape[1]
    S, m = spill.shape
    valid = (
        (spill_live[None, :] != 0)
        & (spill_users[None, :] == uids[:, None])
        & ((dids[:, None] < 0) | (spill_docs[None, :] == dids[:, None]))
    )
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)  # (q, S)
    # ONE shared copy of the spill codes, leading dim 1: the rescore kernel
    # re-reads it per grid row instead of materializing q HBM copies (the
    # per-element table-lookup loop here had the same q*S*m gather cost
    # profile as the probe path above)
    scores = adc_rescore_scores(tables, spill.T[None], bias)
    if spill_assign is not None:  # residual layout: add back q . centroid[assign]
        # computed in-jit so the production search path doesn't pay two
        # extra eager dispatches per search (dead rows are spill_live=0,
        # already NEG_INF-masked, so their offsets are harmless)
        cs = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
        scores = scores + jnp.take(cs, spill_assign, axis=1)
    kk = min(k, spill.shape[0])
    s, sel = jax.lax.top_k(scores, kk)
    return s, jnp.take_along_axis(
        jnp.broadcast_to(spill_ids[None], (qn, spill_ids.shape[0])), sel, axis=1
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _spill_scores_pred_q(
    queries: jnp.ndarray,  # (q, d) f32
    spill: jnp.ndarray,  # (S, d) int8
    spill_scales: jnp.ndarray,  # (S,) f32
    spill_ids: jnp.ndarray,
    spill_users: jnp.ndarray,
    spill_docs: jnp.ndarray,
    spill_live: jnp.ndarray,
    uids: jnp.ndarray,
    dids: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from .topk import quantize_rows_int8

    qn = queries.shape[0]
    qq, qscale = quantize_rows_int8(queries.astype(jnp.float32))
    raw = jnp.dot(
        qq.astype(jnp.bfloat16), spill.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    scores = raw * qscale[:, None] * spill_scales[None, :]
    valid = (
        (spill_live != 0)[None, :]
        & (spill_users[None, :] == uids[:, None])
        & ((dids[:, None] < 0) | (spill_docs[None, :] == dids[:, None]))
    )
    scores = jnp.where(valid, scores, NEG_INF)
    kk = min(k, spill.shape[0])
    s, sel = jax.lax.top_k(scores, kk)
    return s, jnp.take_along_axis(
        jnp.broadcast_to(spill_ids[None], (qn, spill_ids.shape[0])), sel, axis=1
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _spill_scores(
    queries: jnp.ndarray,
    spill: jnp.ndarray,
    spill_ids: jnp.ndarray,
    row_mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qn = queries.shape[0]
    scores = jnp.dot(
        queries.astype(spill.dtype), spill.T, preferred_element_type=jnp.float32
    )
    mask2d = row_mask if row_mask.ndim == 2 else jnp.broadcast_to(row_mask[None], (qn, row_mask.shape[0]))
    valid = (spill_ids >= 0)[None, :] & jnp.take_along_axis(
        mask2d, jnp.clip(spill_ids, 0, None)[None, :].repeat(qn, 0), axis=1
    )
    scores = jnp.where(valid, scores, NEG_INF)
    kk = min(k, spill.shape[0])
    s, sel = jax.lax.top_k(scores, kk)
    return s, jnp.take_along_axis(
        jnp.broadcast_to(spill_ids[None], (qn, spill_ids.shape[0])), sel, axis=1
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _spill_scores_pred(
    queries: jnp.ndarray,
    spill: jnp.ndarray,
    spill_ids: jnp.ndarray,
    spill_users: jnp.ndarray,
    spill_docs: jnp.ndarray,
    spill_live: jnp.ndarray,
    uids: jnp.ndarray,
    dids: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qn = queries.shape[0]
    scores = jnp.dot(
        queries.astype(spill.dtype), spill.T, preferred_element_type=jnp.float32
    )
    valid = (
        (spill_live != 0)[None, :]
        & (spill_users[None, :] == uids[:, None])
        & ((dids[:, None] < 0) | (spill_docs[None, :] == dids[:, None]))
    )
    scores = jnp.where(valid, scores, NEG_INF)
    kk = min(k, spill.shape[0])
    s, sel = jax.lax.top_k(scores, kk)
    return s, jnp.take_along_axis(
        jnp.broadcast_to(spill_ids[None], (qn, spill_ids.shape[0])), sel, axis=1
    )




def ivf_search(
    ivf: IVFData,
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    row_mask: jnp.ndarray,  # (n,) or (q, n) bool over global row ids
    k: int,
    nprobe: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k with an arbitrary row mask (XLA path; prefer
    :func:`ivf_search_pred` on TPU for the reference's tenant/doc masks)."""

    if ivf.is_pq:
        raise ValueError(
            "pq-coded layouts score via ivf_search_pred (ADC), not the "
            "dense row path"
        )
    nprobe = min(nprobe, ivf.n_clusters)
    k_eff = min(k, nprobe * ivf.bucket_size)
    s, i = _ivf_probe(
        queries, ivf.centroids, ivf.buckets, ivf.bucket_ids, row_mask, k_eff, nprobe
    )
    s, i = _pad_k(s, i, k)
    if ivf.spill.shape[0]:
        s2, i2 = _spill_scores(queries, ivf.spill, ivf.spill_ids, row_mask, k)
        s, i = merge_topk(s, i, s2, i2, k)
    return s, i


def ivf_search_pred(
    ivf: IVFData,
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    uids: jnp.ndarray,  # (q,) int32 tenant per query
    dids: jnp.ndarray,  # (q,) int32 doc filter per query (-1 = none)
    k: int,
    nprobe: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predicated top-k: tenant/doc/live masks evaluate in bucket layout
    (in-kernel on TPU) — the production search path."""

    nprobe = min(nprobe, ivf.n_clusters)
    k_eff = min(k, nprobe * ivf.bucket_size)
    if ivf.is_pq:  # PQ-coded layout: ADC scoring against the layout's books
        from .pq import _adc_tables

        tables = jnp.transpose(
            _adc_tables(queries, ivf.pq_codebooks), (0, 2, 1)
        ).astype(jnp.bfloat16)  # (m, q, K)
        s, i = _ivf_probe_pred_adc(
            queries, tables, ivf.centroids, ivf.buckets, ivf.bucket_ids,
            ivf.users_b, ivf.docs_b, ivf.live_b, uids, dids, k_eff, nprobe,
            residual=ivf.pq_residual,
        )
        s, i = _pad_k(s, i, k)
        if ivf.spill.shape[0]:
            residual_args = (
                dict(
                    queries=queries,
                    centroids=ivf.centroids,
                    spill_assign=ivf.spill_assign,
                )
                if ivf.pq_residual
                else {}
            )
            s2, i2 = _spill_scores_pred_adc(
                tables, ivf.spill, ivf.spill_ids, ivf.spill_users,
                ivf.spill_docs, ivf.spill_live, uids, dids, k,
                **residual_args,
            )
            s, i = merge_topk(s, i, s2, i2, k)
        return s, i
    use_pallas = _use_pallas_probe(
        ivf.bucket_size, queries.shape[1], ivf.buckets.dtype.itemsize
    )
    if ivf.scales_b is not None:  # quantized layout (ivf + int8 composition)
        s, i = _ivf_probe_pred_q(
            queries, ivf.centroids, ivf.buckets, ivf.scales_b, ivf.bucket_ids,
            ivf.users_b, ivf.docs_b, ivf.live_b, uids, dids, k_eff, nprobe,
            use_pallas=use_pallas,
        )
    else:
        s, i = _ivf_probe_pred(
            queries, ivf.centroids, ivf.buckets, ivf.bucket_ids,
            ivf.users_b, ivf.docs_b, ivf.live_b, uids, dids, k_eff, nprobe,
            use_pallas=use_pallas,
        )
    s, i = _pad_k(s, i, k)
    if ivf.spill.shape[0]:
        if ivf.scales_b is not None:
            s2, i2 = _spill_scores_pred_q(
                queries, ivf.spill, ivf.spill_scales, ivf.spill_ids,
                ivf.spill_users, ivf.spill_docs, ivf.spill_live, uids, dids, k,
            )
        else:
            s2, i2 = _spill_scores_pred(
                queries, ivf.spill, ivf.spill_ids, ivf.spill_users,
                ivf.spill_docs, ivf.spill_live, uids, dids, k,
            )
        s, i = merge_topk(s, i, s2, i2, k)
    return s, i
