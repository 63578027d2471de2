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

from .topk import NEG_INF, l2_normalize, merge_topk


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


def kmeans(
    rows: jnp.ndarray,  # (n, d), L2-normalized, f32/bf16
    n_clusters: int,
    iters: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spherical k-means; returns (centroids (C, d) f32, assign (n,) int32).

    Init is strided row sampling (deterministic, spread across insertion
    order). Each Lloyd iteration is one compiled step."""

    n = rows.shape[0]
    stride = max(n // n_clusters, 1)
    centroids = l2_normalize(rows[::stride][:n_clusters].astype(jnp.float32))
    if centroids.shape[0] < n_clusters:  # n < C: pad by wrapping
        reps = -(-n_clusters // centroids.shape[0])
        centroids = jnp.tile(centroids, (reps, 1))[:n_clusters]
    for _ in range(max(iters, 1)):
        centroids, _ = _kmeans_step(rows, centroids, n_clusters)
    # final assignment against the final centroids (the loop's assign lags
    # one update behind)
    _, assign = _kmeans_step(rows, centroids, n_clusters)
    return centroids, assign.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------


@dataclass
class IVFData:
    """Device-resident IVF layout over a flat row slab."""

    centroids: jnp.ndarray  # (C, d) f32
    buckets: jnp.ndarray  # (C, B, d) slab dtype
    bucket_ids: jnp.ndarray  # (C, B) int32 global row index, -1 = empty slot
    spill: jnp.ndarray  # (S, d) overflow rows, scored densely (S may be 0)
    spill_ids: jnp.ndarray  # (S,) int32
    built_rows: int  # rows [0, built_rows) are covered by this layout

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def bucket_size(self) -> int:
        return int(self.buckets.shape[1])


def build_ivf(
    slab_rows: jnp.ndarray,  # (n, d) L2-normalized rows (a slab prefix)
    n_clusters: Optional[int] = None,
    bucket_factor: float = 1.5,
    iters: int = 8,
) -> IVFData:
    """Cluster rows and lay them out in fixed-size buckets.

    Row *data* never leaves the device: the host handles only int32 slot
    bookkeeping (which row lands in which bucket slot), then one device
    gather materializes the bucket tensor. ``bucket_factor`` scales bucket
    capacity above the mean cluster size; rows beyond capacity spill.
    """

    n, d = slab_rows.shape
    if n_clusters is None:
        # sqrt scaling keeps probe cost ~ O(sqrt n): 1M -> 2048 clusters
        n_clusters = max(8, min(1 << int(np.ceil(np.log2(max(np.sqrt(n) * 2, 8)))), n))
    bucket = int(-(-n * bucket_factor // n_clusters))
    bucket = max(8, (bucket + 7) // 8 * 8)  # sublane-aligned

    centroids, assign = kmeans(slab_rows, n_clusters, iters)
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

    ids_dev = jnp.asarray(ids)
    buckets = jnp.where(
        (ids_dev >= 0)[..., None],
        slab_rows[jnp.clip(ids_dev, 0, n - 1)],
        jnp.zeros((), slab_rows.dtype),
    )
    if pad_spill:
        sid_dev = jnp.asarray(spill_ids)
        spill = jnp.where(
            (sid_dev >= 0)[:, None],
            slab_rows[jnp.clip(sid_dev, 0, n - 1)],
            jnp.zeros((), slab_rows.dtype),
        )
    else:
        sid_dev = jnp.zeros((0,), jnp.int32)
        spill = jnp.zeros((0, d), slab_rows.dtype)

    return IVFData(
        centroids=centroids,
        buckets=buckets,
        bucket_ids=ids_dev,
        spill=spill,
        spill_ids=sid_dev,
        built_rows=n,
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_probe(
    queries: jnp.ndarray,  # (q, d) f32 normalized
    centroids: jnp.ndarray,
    buckets: jnp.ndarray,
    bucket_ids: jnp.ndarray,
    row_mask: jnp.ndarray,  # (n,) or (q, n) bool over GLOBAL row ids
    k: int,
    nprobe: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
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


def ivf_search(
    ivf: IVFData,
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    row_mask: jnp.ndarray,  # (n,) or (q, n) bool over global row ids
    k: int,
    nprobe: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over the clustered rows (+ exact spill)."""

    nprobe = min(nprobe, ivf.n_clusters)
    k_eff = min(k, nprobe * ivf.bucket_size)
    s, i = _ivf_probe(
        queries, ivf.centroids, ivf.buckets, ivf.bucket_ids, row_mask, k_eff, nprobe
    )
    if k_eff < k:  # pad to caller's k
        pad = k - k_eff
        s = jnp.concatenate([s, jnp.full((s.shape[0], pad), NEG_INF, s.dtype)], axis=1)
        i = jnp.concatenate([i, jnp.full((i.shape[0], pad), -1, i.dtype)], axis=1)
    if ivf.spill.shape[0]:
        s2, i2 = _spill_scores(queries, ivf.spill, ivf.spill_ids, row_mask, k)
        s, i = merge_topk(s, i, s2, i2, k)
    return s, i
