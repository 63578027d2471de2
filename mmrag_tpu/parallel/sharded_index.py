"""Corpus-sharded top-k retrieval over a device mesh.

The multi-chip form of the vector index (SURVEY §2c "LanceDB internal ANN
threading" row): corpus rows are sharded across the ``data`` axis, each
device computes a fused masked matmul+top-k over its HBM-resident shard
(:func:`mmrag_tpu.ops.topk.cosine_topk` inside ``shard_map``), and the per-
shard candidate lists are merged with one ``all_gather`` over ICI — k is
tiny, so the collective moves O(devices * q * k) floats, not the corpus.

Row indices returned are GLOBAL (shard offset added on-device), so callers
map them back to chunk ids exactly as in the single-chip path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
try:  # jax >= 0.8 top-level API; experimental path kept for older jax
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import (
    cosine_topk,
    pad_topk as _pad_to_k,
    predicate_mask_multi,
)
from .mesh import DATA_AXIS


def _merged_topk_fn(mesh: Mesh, k: int, local_score, n_shard_args: int,
                    n_repl_args: int = 1):
    """shard_map factory shared by every backend: ``local_score(*repl_args,
    *shard_args) -> (scores, idx)`` runs per chip (the first replicated arg is
    the query batch); this wraps it with the global-offset + all_gather +
    k-merge that is identical across backends. The local k is clamped to the
    shard row count and the merged output padded back to ``k``, so tiny
    test shards behave like production slabs."""

    def local_topk(*args):
        queries = args[0]
        shard_args = args[n_repl_args:]
        shard_rows = shard_args[0].shape[0]
        k_local = min(k, shard_rows)
        scores, idx = local_score(*args)
        my_offset = jax.lax.axis_index(DATA_AXIS) * shard_rows
        global_idx = idx + my_offset
        # gather every shard's candidates: (n_shards, q, k_local) per device
        all_scores = jax.lax.all_gather(scores, DATA_AXIS)
        all_idx = jax.lax.all_gather(global_idx, DATA_AXIS)
        n_shards = all_scores.shape[0]
        q = queries.shape[0]
        merged_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(q, n_shards * k_local)
        merged_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, n_shards * k_local)
        top_scores, sel = jax.lax.top_k(merged_scores, min(k, n_shards * k_local))
        top_idx = jnp.take_along_axis(merged_idx, sel, axis=-1)
        return _pad_to_k(top_scores, top_idx, k)

    mapped = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P(),) * n_repl_args + (P(DATA_AXIS),) * n_shard_args,
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(mapped)


def sharded_search_fn(mesh: Mesh, k: int, backend: str = "auto"):
    """The engine's production multi-chip search (VectorIndex sharded mode):
    ``fn(queries, uids, dids, slab, users, docs, live)`` where the slab and
    its predicate columns are row-sharded over ``data`` and queries plus
    per-query tenant/doc ids are replicated. The tenant/document predicate is
    evaluated *per shard inside shard_map* (same :func:`predicate_mask_multi`
    as the single-chip path, so isolation semantics are identical) and the
    per-shard top-k candidates merge with one ``all_gather`` over ICI."""

    def local_score(queries, uids, dids, slab, users, docs, live):
        mask = predicate_mask_multi(users, docs, live, uids, dids)
        return cosine_topk(queries, slab, mask, min(k, slab.shape[0]), backend)

    return _merged_topk_fn(mesh, k, local_score, n_shard_args=4, n_repl_args=3)


def sharded_search_int8_fn(mesh: Mesh, k: int):
    """int8 storage-mode variant of :func:`sharded_search_fn`:
    ``fn(queries, uids, dids, slab_q, scales, users, docs, live)`` — each chip
    runs the MXU-native int8 scoring over its quantized HBM shard."""

    from ..ops.topk import _cosine_topk_int8

    def local_score(queries, uids, dids, slab_q, scales, users, docs, live):
        mask = predicate_mask_multi(users, docs, live, uids, dids)
        return _cosine_topk_int8(queries, slab_q, scales, mask, min(k, slab_q.shape[0]))

    return _merged_topk_fn(mesh, k, local_score, n_shard_args=5, n_repl_args=3)


def sharded_search_pq_fn(mesh: Mesh, k: int):
    """Product-quantized storage-mode variant of :func:`sharded_search_fn`:
    ``fn(queries, uids, dids, codebooks, codes, users, docs, live)`` — the
    m-byte code slab and predicate columns are row-sharded; queries and the
    (tiny) codebooks are replicated. Each chip builds its own ADC tables
    from the replicated codebooks (cheaper than any gather: the tables are
    (m, K, q) floats) and scans only its code shard; candidates merge with
    the shared all_gather path. The caller's exact host-refine pass then
    rescores the merged shortlist, exactly as in the single-chip pq mode —
    so PQ error still only ever affects shortlist membership."""

    from ..ops.pq import pq_topk

    def local_score(queries, uids, dids, codebooks, codes, users, docs, live):
        mask = predicate_mask_multi(users, docs, live, uids, dids)
        return pq_topk(queries, codebooks, codes, mask, min(k, codes.shape[0]))

    return _merged_topk_fn(mesh, k, local_score, n_shard_args=4, n_repl_args=4)


def sharded_topk_fn(mesh: Mesh, k: int, backend: str = "auto"):
    """Build a jitted ``(queries, corpus, mask) -> (scores, global_idx)``
    where ``corpus``/``mask`` are row-sharded over ``data`` and outputs are
    fully replicated."""

    def local_score(queries, corpus_shard, mask_shard):
        return cosine_topk(queries, corpus_shard, mask_shard, k, backend)

    return _merged_topk_fn(mesh, k, local_score, n_shard_args=2)


def sharded_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    mesh: Mesh,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper placing inputs with the right shardings.

    ``corpus`` rows must be divisible by the data-axis size (pad with
    ``mask=False`` rows — the caller's slab capacity is a power of two, so
    this holds by construction).
    """

    n_data = mesh.shape[DATA_AXIS]
    if corpus.shape[0] % n_data != 0:
        raise ValueError(
            f"corpus rows {corpus.shape[0]} not divisible by data axis {n_data}"
        )
    fn = sharded_topk_fn(mesh, min(k, corpus.shape[0] // n_data), backend)
    corpus = jax.device_put(corpus, NamedSharding(mesh, P(DATA_AXIS)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(DATA_AXIS)))
    queries = jax.device_put(queries, NamedSharding(mesh, P()))
    scores, idx = fn(queries, corpus, mask)
    return _pad_to_k(scores, idx, k)


def sharded_topk_int8(
    queries: jnp.ndarray,
    corpus_q: jnp.ndarray,  # (n, d) int8 rows
    corpus_scale: jnp.ndarray,  # (n,) f32 per-row scales
    mask: jnp.ndarray,
    k: int,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corpus-sharded top-k over int8 shards (the opt-in quantized index in
    its multi-chip form): each chip runs the MXU-native int8 scoring over its
    HBM shard; the merge is the shared all_gather path."""

    from ..ops.topk import _cosine_topk_int8

    n_data = mesh.shape[DATA_AXIS]
    if corpus_q.shape[0] % n_data != 0:
        raise ValueError(
            f"corpus rows {corpus_q.shape[0]} not divisible by data axis {n_data}"
        )
    k_eff = min(k, corpus_q.shape[0] // n_data)

    def local_score(queries, shard_q, shard_scale, shard_mask):
        return _cosine_topk_int8(queries, shard_q, shard_scale, shard_mask, k_eff)

    fn = _merged_topk_fn(mesh, k_eff, local_score, n_shard_args=3)
    corpus_q = jax.device_put(corpus_q, NamedSharding(mesh, P(DATA_AXIS)))
    corpus_scale = jax.device_put(corpus_scale, NamedSharding(mesh, P(DATA_AXIS)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(DATA_AXIS)))
    queries = jax.device_put(queries, NamedSharding(mesh, P()))
    scores, idx = fn(queries, corpus_q, corpus_scale, mask)
    return _pad_to_k(scores, idx, k)


def merge_slices_host(slice_scores, slice_ids, k: int):
    """Merge per-slice top-k results on the host (DCN side).

    Within one pod slice the merge is the on-device ``all_gather`` above
    (ICI). Across *slices* — independent processes coordinated over DCN,
    SURVEY §2c "Redis broker" row — each slice returns its global top-k to
    the control plane, and this native C++ merge
    (:func:`mmrag_tpu.native.merge_topk`) produces the final list without
    another device dispatch.

    Args: ``slice_scores`` (slices, q, k) f32, ``slice_ids`` (slices, q, k)
    int64 global row ids. Returns ``(scores (q, k), ids (q, k))``.
    """

    import numpy as np

    from .. import native

    return native.merge_topk(
        np.asarray(slice_scores, dtype=np.float32),
        np.asarray(slice_ids, dtype=np.int64),
        k,
    )
