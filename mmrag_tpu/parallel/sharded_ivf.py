"""Partitioned (IVF / IVF_PQ) ANN composed with corpus row sharding.

Multi-chip form of :mod:`mmrag_tpu.ops.ivf` (VERDICT r2 item 2): the
reference's LanceDB IVF_PQ (``/root/reference/app/storage/lancedb_store.py:
51-58,103-123``) behaves identically at any deployment size, so the TPU
framework's partitioned layouts must too — previously a mesh-sharded
:class:`~mmrag_tpu.index.store.VectorIndex` silently downgraded
``TPU_TOPK_BACKEND=ivf`` to the dense sharded scan.

Design (the "shared global centroids, probe locally, all_gather candidates"
shape):

  * ONE set of global centroids is trained from a deterministic evenly-
    spaced sample of the whole corpus (the exact sample the single-chip
    build uses, so centroids — and therefore assignments and probe sets —
    match the single-chip layout bit-for-bit on the same rows).
  * Each chip lays out ITS OWN rows (the contiguous global row range its
    slab shard holds) into a local ``(C, B_s, d)`` bucket tensor with
    ``B_s ≈ B_global / n_shards`` — per-chip probe cost shrinks with the
    shard, which is the point of sharding. Overflow rows spill per shard
    and are scored exactly, so bucket-capacity differences vs the
    single-chip layout can only *add* exactly-scored candidates.
  * All per-shard tensors stack on a leading shard axis sharded over the
    mesh ``data`` axis; bucket/spill row ids are stored GLOBAL, so the
    merged output needs no offset arithmetic and fillers stay ``-1``.
  * A search runs the existing probe kernels (Pallas scalar-prefetch DMA on
    TPU, the XLA gather fallback elsewhere — :mod:`mmrag_tpu.ops.ivf`)
    per shard under ``shard_map``; probe selection is a replicated
    ``(q, C)`` matmul (identical on every chip), and the per-shard top-k
    candidates merge with one ``all_gather`` over ICI — O(shards * q * k)
    floats, never the corpus.

All three storage layouts compose: dense bf16/f32 rows, int8 rows with
per-slot dequant scales, and PQ codes (residual-coded by default) scored by
ADC against replicated codebooks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ivf as ivf_ops
from ..ops.topk import NEG_INF, merge_topk, pad_topk as _pad_k
from .mesh import DATA_AXIS
from .sharded_index import shard_map


@dataclass
class ShardedIVFData:
    """Per-shard IVF bucket layouts stacked on a sharded leading axis.

    Mirrors :class:`mmrag_tpu.ops.ivf.IVFData`'s attribute contract (the
    owning index reads ``centroids`` / ``built_rows`` / ``structure`` /
    ``is_pq`` / ``pq_residual`` and calls :meth:`mark_dead` generically),
    with every per-row tensor carrying a leading ``(n_shards,)`` axis
    sharded over the mesh ``data`` axis. Row ids are GLOBAL."""

    mesh: Mesh
    centroids: jnp.ndarray  # (C, d) f32, replicated
    buckets: jnp.ndarray  # (n_shards, C, B, d|m), P(data)
    bucket_ids: jnp.ndarray  # (n_shards, C, 1, B) int32 global ids, -1 empty
    users_b: jnp.ndarray  # (n_shards, C, 1, B) int32
    docs_b: jnp.ndarray  # (n_shards, C, 1, B) int32
    live_b: jnp.ndarray  # (n_shards, C, 1, B) int32
    spill: jnp.ndarray  # (n_shards, S, d|m) exact-scored overflow (S may be 0)
    spill_ids: jnp.ndarray  # (n_shards, S) int32 global ids, -1 pad
    spill_users: jnp.ndarray  # (n_shards, S) int32
    spill_docs: jnp.ndarray  # (n_shards, S) int32
    spill_live: jnp.ndarray  # (n_shards, S) int32
    slot_of_row: np.ndarray  # host (built_rows, 3): (shard, cluster, slot); cluster -1 = spill
    built_rows: int
    scales_b: Optional[jnp.ndarray] = None  # int8 layout: (n_shards, C, 1, B)
    spill_scales: Optional[jnp.ndarray] = None  # (n_shards, S) f32
    pq_codebooks: Optional[jnp.ndarray] = None  # (m, K, ds) f32 replicated
    structure: float = 0.0
    pq_residual: bool = False
    spill_assign: Optional[jnp.ndarray] = None  # (n_shards, S) int32

    @property
    def is_pq(self) -> bool:
        return self.pq_codebooks is not None

    @property
    def n_shards(self) -> int:
        return int(self.buckets.shape[0])

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def bucket_size(self) -> int:
        return int(self.buckets.shape[2])

    @property
    def spill_size(self) -> int:
        return int(self.spill.shape[1])

    def mark_dead(self, rows: np.ndarray) -> None:
        """Tombstone clustered/spilled rows across all shard layouts."""

        rows = np.asarray(rows)
        rows = rows[rows < self.built_rows]
        if rows.size == 0:
            return
        slots = self.slot_of_row[rows]
        bucketed = slots[slots[:, 1] >= 0]
        spilled = slots[slots[:, 1] < 0]
        if bucketed.size:
            self.live_b = self.live_b.at[
                jnp.asarray(bucketed[:, 0]), jnp.asarray(bucketed[:, 1]),
                0, jnp.asarray(bucketed[:, 2]),
            ].set(0)
        if spilled.size:
            self.spill_live = self.spill_live.at[
                jnp.asarray(spilled[:, 0]), jnp.asarray(spilled[:, 2])
            ].set(0)


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------


@jax.jit
def _assign_scores(rows: jnp.ndarray, centroids: jnp.ndarray):
    """Row-sharded assignment: slab P(data) x replicated centroids keeps the
    matmul local to each chip (GSPMD inserts no collectives); per-row best
    scores come back for the host-side structure statistic."""

    scores = jnp.dot(
        rows, centroids.T.astype(rows.dtype), preferred_element_type=jnp.float32
    )
    return jnp.argmax(scores, axis=1).astype(jnp.int32), jnp.max(scores, axis=1)


def _shard_slot_bookkeeping(
    assign_h: np.ndarray,  # (snap_size,) global assignment
    n_shards: int,
    shard_rows: int,
    n_clusters: int,
    bucket: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized host bookkeeping, one single-chip pass per shard range.

    Returns ``(ids_local (n_shards, C, B), ids_global, spill_local
    (n_shards, S), spill_global, slot_of_row (n, 3))`` where *local* ids
    index into the shard's slab block and *global* into the flat corpus.
    """

    snap = assign_h.shape[0]
    per_shard = []
    spills = []
    slot_of_row = np.full((snap, 3), -1, np.int32)
    for s in range(n_shards):
        lo = s * shard_rows
        hi = min(lo + shard_rows, snap)
        ids = np.full((n_clusters, bucket), -1, np.int32)
        if hi > lo:
            a = assign_h[lo:hi]
            n = hi - lo
            order = np.argsort(a, kind="stable").astype(np.int32)
            sorted_a = a[order]
            starts = np.searchsorted(sorted_a, np.arange(n_clusters))
            pos = np.arange(n) - starts[sorted_a]
            fits = pos < bucket
            ids[sorted_a[fits], pos[fits]] = order[fits]
            spill_local = order[~fits]
            slot_of_row[lo + order[fits], 0] = s
            slot_of_row[lo + order[fits], 1] = sorted_a[fits]
            slot_of_row[lo + order[fits], 2] = pos[fits]
            slot_of_row[lo + spill_local, 0] = s
            slot_of_row[lo + spill_local, 2] = np.arange(
                len(spill_local), dtype=np.int32
            )
        else:
            spill_local = np.zeros((0,), np.int32)
        per_shard.append(ids)
        spills.append(spill_local)

    s_max = max((len(sp) for sp in spills), default=0)
    pad_spill = max(8, (s_max + 7) // 8 * 8) if s_max else 0
    spill_l = np.full((n_shards, pad_spill), -1, np.int32)
    for s, sp in enumerate(spills):
        spill_l[s, : len(sp)] = sp
    ids_local = np.stack(per_shard)
    offs = (np.arange(n_shards, dtype=np.int32) * shard_rows)[:, None, None]
    ids_global = np.where(ids_local >= 0, ids_local + offs, -1)
    spill_global = np.where(
        spill_l >= 0, spill_l + offs[:, :, 0], -1
    )
    return ids_local, ids_global, spill_l, spill_global, slot_of_row


def build_sharded_ivf(
    mesh: Mesh,
    slab: jnp.ndarray,  # (cap, d) rows or (cap, m) pq codes — P(data)
    users: jnp.ndarray,  # (cap,) int32 — P(data)
    docs: jnp.ndarray,
    live: jnp.ndarray,
    snap_size: int,
    n_clusters: Optional[int] = None,
    bucket_factor: float = 1.5,
    iters: int = 8,
    scales: Optional[jnp.ndarray] = None,  # (cap,) f32: slab is int8 rows
    centroids: Optional[jnp.ndarray] = None,  # warm start (skip Lloyd)
    assign: Optional[np.ndarray] = None,  # (snap_size,) precomputed (pq mode)
    structure_override: Optional[float] = None,
    pq_codebooks: Optional[jnp.ndarray] = None,
    pq_residual: bool = False,
) -> ShardedIVFData:
    """Build per-shard bucket layouts over a row-sharded slab.

    Mirrors :func:`mmrag_tpu.ops.ivf.build_ivf`'s contract; the kmeans
    training sample uses the same deterministic ``_even_indices`` row set as
    the single-chip build, so centroids/assignments are identical on the
    same data — only bucket *capacity* (per-shard vs global) differs, and
    overflow is exactly scored either way."""

    n_shards = mesh.shape[DATA_AXIS]
    cap = int(slab.shape[0])
    if cap % n_shards:
        raise ValueError(f"capacity {cap} not divisible by {n_shards} shards")
    shard_rows = cap // n_shards
    if pq_codebooks is not None and (assign is None or centroids is None):
        raise ValueError("pq layout needs precomputed assignment + centroids")

    if assign is not None:
        centroids = jnp.asarray(centroids, jnp.float32)
        n_clusters = int(centroids.shape[0])
        assign_h = np.asarray(assign, np.int32)
        structure = 0.0 if structure_override is None else float(structure_override)
    else:
        if centroids is None:
            if n_clusters is None:
                n_clusters = ivf_ops.default_n_clusters(snap_size)
            sel = jnp.asarray(
                ivf_ops._even_indices(snap_size, min(snap_size, 131072))
            )
            sample = jnp.take(slab, sel, axis=0)
            if scales is not None:  # int8 rows: dequantize the sample only
                sample = sample.astype(jnp.float32) * jnp.take(scales, sel)[:, None]
            centroids, _ = ivf_ops.kmeans(
                sample, n_clusters, iters, train_sample=0
            )
        else:
            centroids = jnp.asarray(centroids, jnp.float32)
            n_clusters = int(centroids.shape[0])
        rows_for_assign = (
            slab.astype(jnp.bfloat16) if scales is not None else slab
        )  # int8 argmax is scale-invariant (ops.ivf._assign_int8 rationale)
        a_dev, best_dev = _assign_scores(rows_for_assign, centroids)
        assign_h = np.asarray(a_dev)[:snap_size]
        best_h = np.asarray(best_dev)[:snap_size]
        if scales is not None:
            best_h = best_h * np.asarray(scales)[:snap_size]
        structure = float(best_h.mean()) if snap_size else 0.0

    shard_n_max = max(
        min((s + 1) * shard_rows, snap_size) - min(s * shard_rows, snap_size)
        for s in range(n_shards)
    )
    bucket = ivf_ops.bucket_size(max(shard_n_max, 1), n_clusters, bucket_factor)
    ids_local, ids_global, spill_l, spill_global, slot_of_row = (
        _shard_slot_bookkeeping(
            assign_h, n_shards, shard_rows, n_clusters, bucket
        )
    )
    pad_spill = spill_l.shape[1]

    shard0 = NamedSharding(mesh, P(DATA_AXIS))
    ids_l_dev = jax.device_put(jnp.asarray(ids_local), shard0)
    spill_l_dev = jax.device_put(jnp.asarray(spill_l), shard0)
    assign_dev = None
    if pq_residual:
        assign_pad = np.zeros((cap,), np.int32)
        assign_pad[:snap_size] = assign_h
        assign_dev = jax.device_put(jnp.asarray(assign_pad), shard0)

    has_scales = scales is not None
    d = int(slab.shape[1])

    def gather(slab_s, users_s, docs_s, live_s, ids_b, spill_b, *extra):
        # blocks: slab_s (shard_rows, d); ids_b (1, C, B); spill_b (1, S)
        ids = ids_b[0]
        clipped = jnp.clip(ids, 0, shard_rows - 1)
        in_slot = ids >= 0
        buckets = jnp.where(
            in_slot[..., None], slab_s[clipped], jnp.zeros((), slab_s.dtype)
        )
        users_b = jnp.where(in_slot, users_s[clipped], -1)
        docs_b = jnp.where(in_slot, docs_s[clipped], -1)
        live_b = jnp.where(in_slot, live_s[clipped].astype(jnp.int32), 0)
        out = [
            buckets[None],
            users_b[:, None, :][None],
            docs_b[:, None, :][None],
            live_b[:, None, :][None],
        ]
        sp = spill_b[0]
        sclip = jnp.clip(sp, 0, shard_rows - 1)
        s_in = sp >= 0
        spill = jnp.where(
            s_in[:, None], slab_s[sclip], jnp.zeros((), slab_s.dtype)
        )
        out += [
            spill[None],
            jnp.where(s_in, users_s[sclip], -1)[None],
            jnp.where(s_in, docs_s[sclip], -1)[None],
            jnp.where(s_in, live_s[sclip].astype(jnp.int32), 0)[None],
        ]
        i = 0
        if has_scales:
            scales_s = extra[i]; i += 1
            out.append(
                jnp.where(in_slot, scales_s[clipped], 1.0)[:, None, :][None]
            )
            out.append(jnp.where(s_in, scales_s[sclip], 1.0)[None])
        if assign_dev is not None:
            assign_s = extra[i]; i += 1
            out.append(jnp.where(s_in, assign_s[sclip], 0)[None])
        return tuple(out)

    extra_in = []
    if has_scales:
        extra_in.append(scales)
    if assign_dev is not None:
        extra_in.append(assign_dev)
    n_out = 8 + (2 if has_scales else 0) + (1 if assign_dev is not None else 0)
    mapped = shard_map(
        gather,
        mesh=mesh,
        in_specs=(P(DATA_AXIS),) * (6 + len(extra_in)),
        out_specs=(P(DATA_AXIS),) * n_out,
        check_rep=False,
    )
    outs = jax.jit(mapped)(
        slab, users, docs, live, ids_l_dev, spill_l_dev, *extra_in
    )
    (buckets, users_b, docs_b, live_b, spill, spill_users, spill_docs,
     spill_live) = outs[:8]
    scales_b = spill_scales = spill_assign = None
    i = 8
    if has_scales:
        scales_b, spill_scales = outs[i], outs[i + 1]
        i += 2
    if assign_dev is not None:
        spill_assign = outs[i]
    if not pad_spill:  # no shard spilled: zero-size spill tensors
        zl = lambda *shape, dt=jnp.int32: jax.device_put(  # noqa: E731
            jnp.zeros(shape, dt), shard0
        )
        spill = zl(n_shards, 0, d, dt=slab.dtype)
        spill_users = spill_docs = spill_live = zl(n_shards, 0)
        spill_scales = zl(n_shards, 0, dt=jnp.float32) if has_scales else None
        spill_assign = zl(n_shards, 0) if pq_residual else None
        spill_global = np.zeros((n_shards, 0), np.int32)

    return ShardedIVFData(
        mesh=mesh,
        centroids=centroids,
        buckets=buckets,
        bucket_ids=jax.device_put(
            jnp.asarray(ids_global[:, :, None, :]), shard0
        ),
        users_b=users_b,
        docs_b=docs_b,
        live_b=live_b,
        spill=spill,
        spill_ids=jax.device_put(jnp.asarray(spill_global), shard0),
        spill_users=spill_users,
        spill_docs=spill_docs,
        spill_live=spill_live,
        slot_of_row=slot_of_row,
        built_rows=snap_size,
        scales_b=scales_b,
        spill_scales=spill_scales,
        pq_codebooks=(
            jnp.asarray(pq_codebooks, jnp.float32)
            if pq_codebooks is not None else None
        ),
        structure=structure,
        pq_residual=bool(pq_residual),
        spill_assign=spill_assign,
    )


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


def sharded_ivf_search_fn(
    mesh: Mesh,
    kind: str,  # "dense" | "int8" | "adc"
    k: int,
    nprobe: int,
    use_pallas: bool,
    has_spill: bool,
    residual: bool = False,
):
    """Jitted shard_map search over a :class:`ShardedIVFData` layout.

    Probe selection (the ``(q, C)`` centroid matmul + top_k) recomputes
    replicated on every chip — identical probes everywhere, cheaper than any
    broadcast. Each chip probes its OWN bucket layout (its ``B_s`` is the
    global bucket cost divided by the shard count) plus its spill slice;
    per-shard candidates (already carrying global row ids) merge with one
    ``all_gather``. Argument layout depends on ``kind``:

      dense: (queries, uids, dids, centroids, buckets, bucket_ids, users_b,
              docs_b, live_b[, spill, spill_ids, spill_users, spill_docs,
              spill_live])
      int8:  ... + scales_b after buckets, spill_scales after spill
      adc:   centroids then pq_codebooks; residual layouts append
             spill_assign last
    """

    def local(queries, uids, dids, centroids, *rest):
        i = 0
        books = None
        if kind == "adc":
            books = rest[i]; i += 1
        buckets = rest[i][0]; i += 1
        scales_b = None
        if kind == "int8":
            scales_b = rest[i][0]; i += 1
        bucket_ids = rest[i][0]; i += 1
        users_b = rest[i][0]; i += 1
        docs_b = rest[i][0]; i += 1
        live_b = rest[i][0]; i += 1
        B = buckets.shape[1]
        np_eff = min(nprobe, buckets.shape[0])
        k_eff = min(k, np_eff * B)
        if kind == "adc":
            from ..ops.pq import _adc_tables

            tables = jnp.transpose(
                _adc_tables(queries, books), (0, 2, 1)
            ).astype(jnp.bfloat16)
            s, ix = ivf_ops._ivf_probe_pred_adc(
                queries, tables, centroids, buckets, bucket_ids,
                users_b, docs_b, live_b, uids, dids, k_eff, np_eff,
                residual=residual,
            )
        elif kind == "int8":
            s, ix = ivf_ops._ivf_probe_pred_q(
                queries, centroids, buckets, scales_b, bucket_ids,
                users_b, docs_b, live_b, uids, dids, k_eff, np_eff,
                use_pallas=use_pallas,
            )
        else:
            s, ix = ivf_ops._ivf_probe_pred(
                queries, centroids, buckets, bucket_ids,
                users_b, docs_b, live_b, uids, dids, k_eff, np_eff,
                use_pallas=use_pallas,
            )
        s, ix = _pad_k(s, ix, k)
        if has_spill:
            spill = rest[i][0]; i += 1
            spill_scales = None
            if kind == "int8":
                spill_scales = rest[i][0]; i += 1
            spill_ids = rest[i][0]; i += 1
            spill_users = rest[i][0]; i += 1
            spill_docs = rest[i][0]; i += 1
            spill_live = rest[i][0]; i += 1
            if kind == "adc":
                extra = (
                    dict(queries=queries, centroids=centroids,
                         spill_assign=rest[i][0])
                    if residual else {}
                )
                s2, i2 = ivf_ops._spill_scores_pred_adc(
                    tables, spill, spill_ids, spill_users, spill_docs,
                    spill_live, uids, dids, k, **extra,
                )
            elif kind == "int8":
                s2, i2 = ivf_ops._spill_scores_pred_q(
                    queries, spill, spill_scales, spill_ids, spill_users,
                    spill_docs, spill_live, uids, dids, k,
                )
            else:
                s2, i2 = ivf_ops._spill_scores_pred(
                    queries, spill, spill_ids, spill_users, spill_docs,
                    spill_live, uids, dids, k,
                )
            s2, i2 = _pad_k(s2, i2, k)
            s, ix = merge_topk(s, ix, s2, i2, k)
        # merge across shards: ids are global, so no offset arithmetic
        all_s = jax.lax.all_gather(s, DATA_AXIS)  # (n_shards, q, k)
        all_i = jax.lax.all_gather(ix, DATA_AXIS)
        n_sh = all_s.shape[0]
        q = queries.shape[0]
        ms = jnp.transpose(all_s, (1, 0, 2)).reshape(q, n_sh * k)
        mi = jnp.transpose(all_i, (1, 0, 2)).reshape(q, n_sh * k)
        top_s, sel = jax.lax.top_k(ms, min(k, n_sh * k))
        top_i = jnp.take_along_axis(mi, sel, axis=-1)
        return _pad_k(top_s, top_i, k)

    n_repl = 4 + (1 if kind == "adc" else 0)
    n_shard = 5 + (1 if kind == "int8" else 0)
    if has_spill:
        n_shard += 5 + (1 if kind == "int8" else 0) + (
            1 if (kind == "adc" and residual) else 0
        )
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) * n_repl + (P(DATA_AXIS),) * n_shard,
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(mapped)


def sharded_ivf_search_args(ivf: ShardedIVFData):
    """Flatten the layout into the argument order the search fn expects
    (after queries/uids/dids/centroids[/codebooks])."""

    args = [ivf.buckets]
    if ivf.scales_b is not None:
        args.append(ivf.scales_b)
    args += [ivf.bucket_ids, ivf.users_b, ivf.docs_b, ivf.live_b]
    if ivf.spill_size:
        args.append(ivf.spill)
        if ivf.spill_scales is not None:
            args.append(ivf.spill_scales)
        args += [ivf.spill_ids, ivf.spill_users, ivf.spill_docs,
                 ivf.spill_live]
        if ivf.is_pq and ivf.pq_residual:
            args.append(ivf.spill_assign)
    return args


def sharded_ivf_kind(ivf: ShardedIVFData) -> str:
    if ivf.is_pq:
        return "adc"
    if ivf.scales_b is not None:
        return "int8"
    return "dense"
