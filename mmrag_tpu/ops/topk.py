"""Masked cosine similarity top-k over device-resident embedding slabs.

This replaces the reference's LanceDB ANN search
(``/root/reference/app/storage/lancedb_store.py:103-123``) with exact,
device-resident scoring: corpus shards live in HBM as static-shape slabs,
queries hit a single fused ``matmul -> mask -> top_k`` dispatch. Tenant and
``video_id`` predicates are pushed *into* the scoring mask (additive -inf)
rather than applied post-fusion — fixing the reference's post-filter bug
(``api/routes.py:272-279``, SURVEY §3.3).

Three backends behind one API:
  * ``xla``   — ``jnp.dot`` + ``jax.lax.top_k``; works on CPU and TPU.
  * ``pallas``— fused tiled matmul + bucket-max + rescore kernel (exact),
                see :mod:`mmrag_tpu.ops.pallas_topk`.
  * ``approx``— ``jax.lax.approx_max_k`` (TPU PartialReduce hardware op),
                the true analogue of the reference's IVF_PQ *approximate*
                index (``lancedb_store.py:51-60``) but with a tunable recall
                target instead of fixed partitions.

Scores are cosine similarities assuming L2-normalized rows/queries, matching
the reference's ``score = 1 - distance`` resort (``lancedb_store.py:125-139``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# A NUMPY scalar on purpose: a module-level ``jnp.float32`` would become a
# leaked tracer if this module is first imported inside a jit trace (jax 0.9
# creates constants as tracers under an active trace), permanently poisoning
# every later ``float(NEG_INF)``. np scalars weak-type into jnp ops the same
# way and are always concrete.
NEG_INF = np.float32(-1e30)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Zero-safe L2 normalization (reference ``app/ml/embeddings.py:46-49``)."""

    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def predicate_mask(users, docs, live, user_id, doc_id):
    """Tenant + optional-document mask, single-query form. The ONE place the
    isolation predicate lives — single/multi, int8/exact, single-chip and the
    per-shard form inside ``shard_map`` all route here."""

    return live & (users == user_id) & ((doc_id < 0) | (docs == doc_id))


def predicate_mask_multi(users, docs, live, user_ids, doc_ids):
    """Per-query ``(q, n)`` form of :func:`predicate_mask`."""

    return (
        live[None, :]
        & (users[None, :] == user_ids[:, None])
        & ((doc_ids[:, None] < 0) | (docs[None, :] == doc_ids[:, None]))
    )


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def _cosine_topk_approx(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    scores = jnp.dot(
        queries.astype(corpus.dtype),
        corpus.T,
        preferred_element_type=jnp.float32,
    )
    mask = valid_mask if valid_mask.ndim == 2 else valid_mask[None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


@functools.partial(jax.jit, static_argnames=("k",))
def _cosine_topk_xla(
    queries: jnp.ndarray,  # (q, d) f32/bf16, L2-normalized
    corpus: jnp.ndarray,  # (n, d) bf16 slab (padded rows are masked out)
    valid_mask: jnp.ndarray,  # (n,) or (q, n) bool — live AND passes predicates
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # Matmul precision: storage dtype decides speed. A bf16 corpus takes the
    # native MXU bf16 path (DEFAULT); for f32 corpora HIGHEST stops backends
    # from silently downcasting (XLA-CPU/oneDNN does under DEFAULT), which
    # would break <=1e-3 score parity.
    precision = (
        jax.lax.Precision.DEFAULT
        if corpus.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    scores = jnp.dot(
        queries.astype(corpus.dtype),
        corpus.T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    mask = valid_mask if valid_mask.ndim == 2 else valid_mask[None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


def quantize_rows_int8(mat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization: returns ``(int8 rows, f32 row
    scales)`` with ``row ≈ int8 * scale``. For L2-normalized rows the dot
    error is ~1%% — an opt-in storage mode (``TPU_INDEX_DTYPE=int8``) that
    halves HBM per row vs bf16 and runs the MXU's native int8 path; NOT for
    the ≤1e-3 parity contract."""

    absmax = jnp.max(jnp.abs(mat), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(mat / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _cosine_topk_int8(
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    corpus_q: jnp.ndarray,  # (n, d) int8
    corpus_scale: jnp.ndarray,  # (n,) f32
    valid_mask: jnp.ndarray,  # (n,) or (q, n) bool
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qq, qscale = quantize_rows_int8(queries.astype(jnp.float32))
    raw = jax.lax.dot_general(
        qq,
        corpus_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,  # MXU-native int8 x int8 -> int32
    )
    scores = raw.astype(jnp.float32) * qscale[:, None] * corpus_scale[None, :]
    mask = valid_mask if valid_mask.ndim == 2 else valid_mask[None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


def cosine_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine scores + row indices per query.

    ``valid_mask`` is ``(n,)`` (one predicate for every query) or ``(q, n)``
    (per-query predicates — multi-tenant batched search, where each coalesced
    query carries its own tenant/document mask).

    Returns ``(scores (q, k) f32, indices (q, k) i32)``. Indices of masked-out
    / padded rows never appear unless fewer than ``k`` rows are valid, in
    which case the filler entries carry scores <= -1e30 (callers drop them).
    """

    if queries.ndim != 2 or corpus.ndim != 2:
        raise ValueError("queries and corpus must be rank-2")
    if valid_mask.ndim == 2 and valid_mask.shape[0] != queries.shape[0]:
        raise ValueError(
            f"per-query mask rows {valid_mask.shape[0]} != queries {queries.shape[0]}"
        )
    if queries.shape[1] != corpus.shape[1]:
        raise ValueError(
            f"dim mismatch: queries {queries.shape} vs corpus {corpus.shape}"
        )
    n = corpus.shape[0]
    k_eff = min(k, n)
    if backend not in ("auto", "xla", "pallas", "approx"):
        raise ValueError(f"unknown topk backend {backend!r}")
    if backend == "auto":
        # Measured @1M x 384 on v5e: lax.top_k cost scales with the query
        # count (1 query 1.1 ms -> 16 queries 30.7 ms); the Pallas bucket-max
        # path reduces the sort width 128x and wins 4.5x for batched queries.
        # It needs a tile-aligned corpus (padding would copy the whole slab
        # per call) — index slabs are power-of-two capacity, so this holds.
        # Floor at 128k rows: below that lax.top_k is already micro-seconds,
        # and keeping small serving indexes on plain XLA avoids gratuitous
        # exposure to the sporadic Mosaic INVALID_ARGUMENT client-poisoning
        # hazard (KERNELS.md "runtime hazard"; tools/repro_invalid_argument.py).
        from .pallas_topk import TILE_N

        if (
            jax.default_backend() == "tpu"  # Mosaic kernel; GPU/CPU -> xla
            and queries.shape[0] >= 8
            and n >= max(TILE_N, 131072)
            and n % TILE_N == 0
        ):
            backend = "pallas"
        else:
            backend = "xla"
    if backend == "pallas":
        from .pallas_topk import fused_cosine_topk

        scores, idx = fused_cosine_topk(queries, corpus, valid_mask, k_eff)
    elif backend == "approx":
        idx_dtype_k = min(k_eff, n)
        scores, idx = _cosine_topk_approx(queries, corpus, valid_mask, idx_dtype_k)
        idx = idx.astype(jnp.int32)
    else:
        scores, idx = _cosine_topk_xla(queries, corpus, valid_mask, k_eff)
    if k_eff < k:
        pad = k - k_eff
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=float(NEG_INF))
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=0)
    return scores, idx


def pad_topk(
    scores: jnp.ndarray, idx: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad clamped top-k lists back to ``k`` with the standard -1e30/-1
    fillers (shared by the IVF and sharded paths)."""

    if scores.shape[-1] >= k:
        return scores, idx
    pad = k - scores.shape[-1]
    scores = jnp.concatenate(
        [scores, jnp.full((*scores.shape[:-1], pad), NEG_INF, scores.dtype)], axis=-1)
    idx = jnp.concatenate(
        [idx, jnp.full((*idx.shape[:-1], pad), -1, idx.dtype)], axis=-1)
    return scores, idx


def merge_topk(
    scores_a: jnp.ndarray,
    idx_a: jnp.ndarray,
    scores_b: jnp.ndarray,
    idx_b: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two per-query top-k lists into one (used for shard merges)."""

    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_scores, sel = jax.lax.top_k(scores, min(k, scores.shape[-1]))
    return top_scores, jnp.take_along_axis(idx, sel, axis=-1)
