"""Fused masked cosine top-k as a Pallas TPU kernel (SURVEY §7 step 3).

Replaces the XLA path's ``materialize (Q, N) scores -> lax.top_k`` with an
exact two-phase reduction that never writes the score matrix to HBM:

  Phase A (Pallas)  grid over corpus row tiles; each step computes
                    ``queries @ tile.T`` on the MXU, adds the predicate mask
                    as an additive bias, and reduces the tile's scores to
                    per-bucket maxima (bucket = 128 contiguous rows). Output
                    is ``(Q, N/128)`` — 128x smaller than the score matrix,
                    one cheap VPU max-reduce per tile.
  Phase B (XLA)     ``top_k`` over bucket maxima picks the ``k + margin``
                    hottest buckets per query (tiny: N/128 entries).
  Phase C (XLA)     gather those buckets' corpus rows, rescore exactly, and
                    ``top_k`` over ``(k + margin) * 128`` candidates.

Exactness: every global top-k element makes its bucket's max >= s_k (the
k-th best score), so all buckets holding top-k elements rank within the top-k
buckets by max — phase B with ``margin >= 0`` covers them (ties at the s_k
boundary are interchangeable). This is the ScaNN-style partition-then-rescore
recipe, but exact because buckets are scored by true maxima, not centroids.

Measured @ 1M x 384 bf16 on v5e: single query ~parity with dense XLA
(~1.1 ms — both HBM-bound on the corpus read); batched queries 7.8x faster
(16 cross-tenant queries 30.7 -> ~4 ms) because ``lax.top_k`` cost scales
with the query count while the bucket-max shrinks the sort width 128x.
``cosine_topk(auto)`` routes q>=8 tile-aligned corpora here.

The reference's equivalent is LanceDB's IVF_PQ ANN
(``/root/reference/app/storage/lancedb_store.py:51-60,103-123``) — approximate
recall there, exact here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# np scalar, not jnp: a module-level jnp constant becomes a leaked tracer if
# the module is first imported inside a jit trace (see ops/topk.py NEG_INF)
NEG = _np.float32(-1e30)

BUCKET = 128  # rows per bucket == one MXU/VPU lane tile
TILE_N = 2048  # corpus rows per grid step (16 buckets)
MARGIN = 4  # extra buckets rescored in phase C (tie safety at zero cost)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket_max_kernel(q_ref, c_ref, bias_ref, out_ref):
    """One corpus tile: scores = q @ c.T + bias, reduced to bucket maxima."""

    # same precision contract as _cosine_topk_xla: f32 slabs must not be
    # silently downcast (<=1e-3 score parity); bf16 takes the native path
    precision = (
        jax.lax.Precision.DEFAULT
        if c_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    scores = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Qp, TILE_N)
    # bias is (1, TILE_N) (shared mask, broadcast) or (Qp, TILE_N) (per-query
    # tenant masks): -1e30 on dead rows
    scores = scores + bias_ref[:]
    qp = scores.shape[0]
    # out block is (1, qp, BPT): trailing dims equal the full array dims, the
    # layout Mosaic accepts for a non-128-multiple bucket count per tile.
    out_ref[0] = jnp.max(scores.reshape(qp, TILE_N // BUCKET, BUCKET), axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _fused_topk(
    queries: jnp.ndarray,  # (Qp, D) corpus dtype, rows padded with zeros
    corpus: jnp.ndarray,  # (Np, D) bf16/f32, Np % TILE_N == 0
    bias: jnp.ndarray,  # (1, Np) f32: 0 live / -1e30 masked-or-padded
    k: int,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qp, d = queries.shape
    np_, _ = corpus.shape
    n_buckets = np_ // BUCKET
    n_tiles = np_ // TILE_N
    grid = (n_tiles,)

    tile_max = pl.pallas_call(
        _bucket_max_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bias.shape[0], TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qp, TILE_N // BUCKET), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, qp, TILE_N // BUCKET), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * d,
            bytes_accessed=np_ * d * corpus.dtype.itemsize + qp * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, corpus, bias)
    bucket_max = tile_max.transpose(1, 0, 2).reshape(qp, n_buckets)

    # Phase B: hottest buckets per query (ties at the boundary are covered by
    # MARGIN; any k buckets with max >= s_k contain a valid top-k set).
    kb = min(k + MARGIN, n_buckets)
    _, bucket_idx = jax.lax.top_k(bucket_max, kb)  # (Qp, kb)

    # Phase C: exact rescore of candidate rows only.
    rows = bucket_idx[:, :, None] * BUCKET + jnp.arange(BUCKET)[None, None, :]
    rows = rows.reshape(qp, kb * BUCKET)  # (Qp, C) global row ids
    cand = jnp.take(corpus, rows.reshape(-1), axis=0).reshape(qp, kb * BUCKET, d)
    precision = (
        jax.lax.Precision.DEFAULT
        if corpus.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    cand_scores = jax.lax.dot_general(
        queries,
        cand,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Qp, C)
    if bias.shape[0] == 1:
        cand_bias = jnp.take(bias[0], rows.reshape(-1)).reshape(qp, kb * BUCKET)
    else:  # per-query masks: gather each query's own bias row
        cand_bias = jnp.take_along_axis(bias, rows, axis=1)
    cand_scores = cand_scores + cand_bias
    top_scores, local = jax.lax.top_k(cand_scores, k)
    top_idx = jnp.take_along_axis(rows, local, axis=-1)
    return top_scores, top_idx.astype(jnp.int32)


def fused_cosine_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact masked cosine top-k via the fused Pallas path.

    Same contract as :func:`mmrag_tpu.ops.topk.cosine_topk`: returns
    ``(scores (Q, k) f32, indices (Q, k) i32)``; rows failing ``valid_mask``
    (or padding) surface only as fillers with scores <= -1e29 when fewer than
    ``k`` rows are valid. Falls back to dense XLA for corpora smaller than
    one tile, where fusion buys nothing.
    """

    from .topk import _cosine_topk_xla  # small-N fallback (circular-safe)

    q, d = queries.shape
    n = corpus.shape[0]
    k = min(k, n)
    if n < TILE_N:
        # below one tile the fusion buys nothing; non-tile-multiple n above
        # that is handled by the padding below (padded rows masked out)
        return _cosine_topk_xla(queries, corpus, valid_mask, k)

    qp = max(8, _round_up(q, 8))
    dp = _round_up(d, 128)
    np_ = _round_up(n, TILE_N)
    queries = queries.astype(corpus.dtype)
    if qp != q or dp != d:
        queries = jnp.pad(queries, ((0, qp - q), (0, dp - d)))
    pad_rows = np_ - n
    if pad_rows or dp != d:
        corpus = jnp.pad(corpus, ((0, pad_rows), (0, dp - d)))
        pad_spec = ((0, 0), (0, pad_rows)) if valid_mask.ndim == 2 else (0, pad_rows)
        valid_mask = jnp.pad(valid_mask, pad_spec)
    if valid_mask.ndim == 2:  # per-query tenant masks
        bias = jnp.where(valid_mask, 0.0, NEG).astype(jnp.float32)
        if qp != q:
            bias = jnp.pad(bias, ((0, qp - q), (0, 0)), constant_values=float(NEG))
    else:
        bias = jnp.where(valid_mask, 0.0, NEG).astype(jnp.float32)[None, :]

    interpret = jax.default_backend() == "cpu"
    scores, idx = _fused_topk(queries, corpus, bias, k, interpret)
    return scores[:q], idx[:q]
