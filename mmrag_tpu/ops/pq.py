"""Product quantization (PQ): m-byte codes + ADC search for the TPU.

The "PQ" half of the reference's LanceDB IVF_PQ index
(``/root/reference/app/storage/lancedb_store.py:51-58``,
``num_sub_vectors=16``): each row is split into ``m`` subvectors, each
quantized to one of 256 per-subvector centroids, so a 384-d f32 row (1536 B)
compresses to ``m`` bytes (16 by default — 96x, or 48x vs the bf16 slab).
Cosine of L2-normalized vectors decomposes over subvectors
(``cos(q, x) = sum_m q_m . x_m``), so scoring a code is ``m`` table lookups
(asymmetric distance computation, ADC).

TPU-first design decisions:

  * **Codebooks train on the MXU**: ``m`` independent Euclidean k-means
    (NOT spherical — subvectors aren't unit-norm; Lloyd's objective
    ``min ||x - c||^2`` makes the reconstructed dot unbiased), vmapped over
    subvectors so the whole training step is one batched matmul + one
    ``segment_sum`` per iteration.
  * **Codes live on device as int8** (bias -128): the HBM-resident search
    state is ``m`` bytes/row; a query's working set adds ~8q B/row
    (the (n, q) f32 score accumulator + its top-k copy), so a 16 GB chip
    serves ~50M rows at q=16 where the bf16 slab caps out near 10M. The
    f32 originals stay in HOST RAM (see ``VectorIndex``) for snapshots and
    exact refine — host memory is the abundant tier.
  * **Fused Pallas ADC** (``_pq_topk_fused``): the two-phase bucket-max
    recipe of ``ops/pallas_topk.py`` applied to codes — per tile, one-hot
    MXU contractions against VMEM-resident bf16 tables score 2048 rows
    without the (n, q) matrix ever touching HBM, reduced to per-bucket
    maxima; hottest buckets are ADC-rescored in XLA. The scan-of-gathers
    path (``_pq_topk_scan``) remains the correct-everywhere fallback for
    sub-tile corpora and mesh shards; both consume the same bf16-rounded
    tables so their scores are identical.
  * **Exact refine on host**: ADC returns ``k * refine`` candidates; the
    caller rescores them against the host-RAM originals (a (q, k*refine, d)
    numpy matmul — microseconds) and keeps the true top-k. This is LanceDB's
    ``refine_factor`` role and is what holds recall at ~exact levels.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import NEG_INF

PQ_K = 256  # centroids per subvector (8-bit codes; tables stay VMEM-sized)


# ---------------------------------------------------------------------------
# Codebook training (m independent Euclidean k-means, vmapped)
# ---------------------------------------------------------------------------


def _assign_one(rows: jnp.ndarray, cents: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid assignment for one subvector: argmin ||x - c||^2 =
    argmax (x.c - ||c||^2 / 2) — one batched matmul. (n, ds), (K, ds) ->
    (n,) int32."""

    bias = 0.5 * jnp.sum(cents * cents, axis=1)
    return jnp.argmax(
        jnp.dot(rows, cents.T, preferred_element_type=jnp.float32)
        - bias[None, :],
        axis=1,
    ).astype(jnp.int32)


@jax.jit
def _pq_kmeans_step(sub_rows: jnp.ndarray, codebooks: jnp.ndarray):
    """One Lloyd iteration for every subvector at once.

    sub_rows (m, n, ds) f32, codebooks (m, K, ds) f32 -> updated codebooks.
    Update: per-cluster mean via segment_sum; empty clusters keep their
    centroid (same convention as ops.ivf).
    """

    def one(rows, cents):
        assign = _assign_one(rows, cents)
        sums = jax.ops.segment_sum(rows, assign, PQ_K)
        counts = jax.ops.segment_sum(
            jnp.ones((rows.shape[0],), jnp.float32), assign, PQ_K
        )
        return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cents)

    return jax.vmap(one)(sub_rows, codebooks)


@jax.jit
def _pq_assign(sub_rows: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """(m, n, ds), (m, K, ds) -> codes (n, m) int32."""

    return jax.vmap(_assign_one)(sub_rows, codebooks).T


def _split_subvectors(rows: jnp.ndarray, m: int) -> jnp.ndarray:
    """(n, d) -> (m, n, d/m); d must divide by m (384 / 16 = 24)."""

    n, d = rows.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by {m} subvectors")
    return jnp.transpose(rows.reshape(n, m, d // m), (1, 0, 2))


def train_pq(
    rows: jnp.ndarray,  # (n, d) f32, L2-normalized
    m: int = 16,
    iters: int = 10,
    train_sample: int = 65536,
) -> jnp.ndarray:
    """Train (m, K, ds) codebooks. Init = strided row sample per subvector
    (deterministic; wraps when n < K, matching ops.ivf.kmeans); Lloyd runs
    on a strided subsample to bound build-time HBM traffic."""

    n = rows.shape[0]
    train = rows
    if train_sample and n > train_sample:
        # evenly spaced (NOT a prefix — insertion order is per-tenant, so a
        # later tenant's geometry would go unseen; NOT an integer stride —
        # a ceil stride halves the sample just past the cap)
        from .ivf import _even_indices

        train = rows[_even_indices(n, train_sample)]
    sub = _split_subvectors(train.astype(jnp.float32), m)
    tn = sub.shape[1]
    stride = max(tn // PQ_K, 1)
    init = sub[:, ::stride, :][:, :PQ_K, :]
    if init.shape[1] < PQ_K:
        reps = -(-PQ_K // init.shape[1])
        init = jnp.tile(init, (1, reps, 1))[:, :PQ_K, :]
    codebooks = init
    for _ in range(max(iters, 1)):
        codebooks = _pq_kmeans_step(sub, codebooks)
    return codebooks


ENCODE_CHUNK = 65536


def pq_encode(rows: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """(n, d) -> (n, m) int8 codes (bias -128, int8 is the device dtype).

    Encodes in ``ENCODE_CHUNK``-row chunks: the assignment matmul
    materializes an (m, chunk, K) f32 distance transient (~1 GB at 65k
    rows), so a single-shot multi-million-row encode would ask for more
    HBM than the chip has."""

    m = codebooks.shape[0]
    n = rows.shape[0]
    if n <= ENCODE_CHUNK:
        codes = _pq_assign(
            _split_subvectors(rows.astype(jnp.float32), m), codebooks
        )
        return (codes - 128).astype(jnp.int8)
    return jnp.concatenate([
        pq_encode(rows[lo : lo + ENCODE_CHUNK], codebooks)
        for lo in range(0, n, ENCODE_CHUNK)
    ])


# ---------------------------------------------------------------------------
# ADC search
# ---------------------------------------------------------------------------


@jax.jit
def _adc_tables(queries: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """(q, d) x (m, K, ds) -> per-subvector lookup tables (m, K, q)."""

    q, d = queries.shape
    m, K, ds = codebooks.shape
    qsub = jnp.transpose(
        queries.astype(jnp.float32).reshape(q, m, ds), (1, 0, 2)
    )  # (m, q, ds)
    return jnp.einsum(
        "mqd,mkd->mkq", qsub, codebooks, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _pq_topk_scan(
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    codebooks: jnp.ndarray,  # (m, K, ds) f32
    codes: jnp.ndarray,  # (n, m) int8 (bias -128)
    valid_mask: jnp.ndarray,  # (n,) or (q, n) bool
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan-of-gathers ADC path (correct everywhere; serves small corpora
    and sub-tile shards). The scan carries ONLY the (n, q) f32 accumulator;
    each step gathers from a (K, q) table with (n,) codes — no (n, m, K)
    one-hot ever materializes, and the int8 codes upcast per step (an (n,)
    int32 transient), so peak search HBM is the m-byte code slab + ~8q
    B/row of accumulator/top-k working set. Tables are rounded to bf16 —
    the same values the fused kernel's MXU consumes — so both paths score
    identically (each ADC term is one exact bf16 selection, f32-summed)."""

    n = codes.shape[0]
    q = queries.shape[0]
    tables = _adc_tables(queries, codebooks).astype(jnp.bfloat16)  # (m, K, q)
    codes_t = codes.T  # (m, n) int8 — same bytes as the code slab

    def step(acc, inputs):
        table, c = inputs  # (K, q) bf16, (n,) int8
        sel = jnp.take(table, c.astype(jnp.int32) + 128, axis=0)
        return acc + sel.astype(jnp.float32), None

    scores, _ = jax.lax.scan(
        step, jnp.zeros((n, q), jnp.float32), (tables, codes_t)
    )
    scores = scores.T  # (q, n)
    mask = valid_mask if valid_mask.ndim == 2 else valid_mask[None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


# -- fused Pallas ADC (two-phase bucket-max, mirrors ops/pallas_topk.py) -----

ADC_TILE = 2048  # code rows per grid step
ADC_BUCKET = 128  # rows per bucket (one lane tile)
ADC_MARGIN = 4  # extra buckets rescored (tie safety)


def _adc_bucket_max_kernel(tables_ref, codes_ref, bias_ref, out_ref):
    """One code tile: ADC scores via one-hot MXU matmuls, reduced to
    per-bucket maxima — the (n, q) score matrix never touches HBM.

    tables (m, qp, K) bf16 resident in VMEM; per subvector j the kernel
    builds the (K, tile) one-hot of the tile's j-th code row on the VPU
    and contracts ``tables[j] @ onehot`` on the MXU: each output element
    selects exactly one bf16 table entry (1.0 is exact in bf16), summed in
    f32 — bit-identical to the scan path's gathers of the same bf16
    tables.

    codes arrive LANE-MAJOR (m, tile): ``codes[j]`` is a sublane extract
    already laid out along lanes, which broadcasts straight into the
    (K, tile) compare. The row-major (tile, m) form needs a sublane->lane
    relayout of each 2048-wide column extract, and Mosaic's compiler HANGS
    (not errors — unbounded compile, >25 min at one tile) lowering that
    int8 relayout; see KERNELS.md "Runtime hazard" round-2 postmortem."""

    m, tile = codes_ref.shape
    K = tables_ref.shape[2]
    qp = tables_ref.shape[1]
    codes = codes_ref[:].astype(jnp.int32) + 128  # (m, tile)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, tile), 0)
    acc = jnp.zeros((qp, tile), jnp.float32)
    for j in range(m):
        onehot = (codes[j][None, :] == iota_k).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            tables_ref[j],  # (qp, K) bf16
            onehot,  # (K, tile) bf16
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    scores = acc + bias_ref[:]  # (qp, tile) or broadcast (1, tile)
    out_ref[0] = jnp.max(
        scores.reshape(qp, tile // ADC_BUCKET, ADC_BUCKET), axis=-1
    )


ADC_CAND_TILE = 2048  # candidate columns per rescore grid step


def _adc_rescore_kernel(tables_ref, codes_ref, bias_ref, out_ref):
    """Exact ADC rescore of ONE query's candidate tile (phase C).

    Same one-hot MXU selection as ``_adc_bucket_max_kernel`` but with the
    single query's (1, K) table row — grid walks (query, candidate-tile).
    This replaces an XLA ``take_along_axis`` rescore: TPU gathers pay per
    ELEMENT (m * C * q lookups measured 57 ms at C=21k, q=16), while the
    one-hot contraction pays tiny padded MXU flops. The bias rides in so
    the output is final: masked/padded candidates leave as NEG_INF.
    Codes arrive lane-major (1, m, CT) per the phase-A Mosaic hazard
    note (sublane->lane relayout hangs the compiler)."""

    K = tables_ref.shape[2]
    m = codes_ref.shape[1]
    ct = codes_ref.shape[2]
    codes = codes_ref[0].astype(jnp.int32) + 128  # (m, CT)
    tq = tables_ref[0]  # (m, K) bf16 — this query's tables
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, ct), 0)
    acc = jnp.zeros((1, ct), jnp.float32)
    for j in range(m):
        onehot = (codes[j][None, :] == iota_k).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            tq[j : j + 1],  # (1, K) — subvector j's table
            onehot,  # (K, CT)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc[0] + bias_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pq_topk_fused(
    tables: jnp.ndarray,  # (m, qp, K) bf16 per-query ADC tables
    codes: jnp.ndarray,  # (Np, m) int8, Np % ADC_TILE == 0
    bias: jnp.ndarray,  # (1|qp, Np) f32: 0 live / NEG_INF masked-or-padded
    k: int,
    interpret: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m, qp, K = tables.shape
    np_ = codes.shape[0]
    n_buckets = np_ // ADC_BUCKET
    n_tiles = np_ // ADC_TILE
    bpt = ADC_TILE // ADC_BUCKET

    # lane-major codes for the kernel (XLA transpose, 16 B/row; the
    # row-major form stays live for phase C's row gathers). Mosaic hangs
    # compiling the row-major layout — see the kernel docstring.
    codes_t = codes.T  # (m, Np) int8

    tile_max = pl.pallas_call(
        _adc_bucket_max_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m, qp, K), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, ADC_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bias.shape[0], ADC_TILE), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qp, bpt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, qp, bpt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * K * m,
            bytes_accessed=np_ * m + qp * np_ * 4 // ADC_BUCKET,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tables, codes_t, bias)
    bucket_max = tile_max.transpose(1, 0, 2).reshape(qp, n_buckets)

    # Phase B: hottest buckets per query (exact for the ADC ordering: every
    # top-k row makes its bucket max >= the k-th score, so k + margin
    # buckets cover the top-k set).
    kb = min(k + ADC_MARGIN, n_buckets)
    _, bucket_idx = jax.lax.top_k(bucket_max, kb)

    # Phase C: exact ADC rescore of candidate rows only. Candidates are
    # fetched BUCKET-granular (kb contiguous (128, m) blocks per query —
    # XLA's TPU gather pays per row, so the block form costs ~40 us where
    # kb*128 scattered m-byte rows cost ms), then rescored by the one-hot
    # MXU kernel: an XLA take_along_axis rescore of the same candidates
    # measured 57 ms @ C=21k/q=16 — per-ELEMENT gathers — vs ~1 ms here.
    rows = bucket_idx[:, :, None] * ADC_BUCKET + jnp.arange(ADC_BUCKET)[None, None, :]
    rows = rows.reshape(qp, kb * ADC_BUCKET)  # (qp, C) global row ids
    C = kb * ADC_BUCKET
    codes_b = codes.reshape(np_ // ADC_BUCKET, ADC_BUCKET, m)
    cand_codes = (
        jnp.take(codes_b, bucket_idx.reshape(-1), axis=0)
        .reshape(qp, C, m)
        .transpose(0, 2, 1)  # (qp, m, C) lane-major candidates
    )
    if bias.shape[0] == 1:
        bias_b = bias[0].reshape(np_ // ADC_BUCKET, ADC_BUCKET)
        cand_bias = jnp.take(bias_b, bucket_idx.reshape(-1), axis=0).reshape(qp, C)
    else:
        # per-query (q, n) masks (the store's multi-tenant path): gather
        # bucket-granular here too — whole (128,) blocks per index, the
        # same batched row gather the codes take, not qp*C element lookups
        cand_bias = jax.vmap(
            lambda b_q, idx_q: jnp.take(
                b_q.reshape(np_ // ADC_BUCKET, ADC_BUCKET), idx_q, axis=0
            )
        )(bias, bucket_idx).reshape(qp, C)

    scores = adc_rescore_scores(tables, cand_codes, cand_bias, interpret)
    top_scores, local = jax.lax.top_k(scores, k)
    top_idx = jnp.take_along_axis(rows, local, axis=-1)
    return top_scores, top_idx.astype(jnp.int32)


def adc_rescore_scores(
    tables: jnp.ndarray,  # (m, q, K) bf16 per-query ADC tables
    cand_codes: jnp.ndarray,  # (q|1, m, S) int8 lane-major candidates
    bias: jnp.ndarray,  # (q, S) f32: 0 live / NEG_INF dead
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Biased ADC scores of per-query candidate sets via the one-hot MXU
    rescore kernel — (q, S) f32, bias folded in. The shared engine behind
    the flat fused path's phase C and the IVF_PQ probe rescore: XLA's
    per-ELEMENT candidate gathers (q*S*m table lookups) are the dominant
    cost at both sites (57 ms @ q=16, S=21k), the kernel is ~1 ms. S pads
    internally to ADC_CAND_TILE (padded columns return NEG_INF). A
    leading dim of 1 on ``cand_codes`` means the candidate set is SHARED
    across queries (the spill path): the kernel re-reads the one copy per
    grid row instead of materializing q broadcast copies in HBM."""

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, q, K = tables.shape
    S = cand_codes.shape[2]
    shared = cand_codes.shape[0] == 1
    sp = _round_up(S, ADC_CAND_TILE)
    if sp != S:
        cand_codes = jnp.pad(cand_codes, ((0, 0), (0, 0), (0, sp - S)))
        bias = jnp.pad(
            bias, ((0, 0), (0, sp - S)), constant_values=float(NEG_INF)
        )
    tables_q = tables.transpose(1, 0, 2)  # (q, m, K): per-query blocks
    codes_map = (
        (lambda qi, ci: (0, 0, ci)) if shared
        else (lambda qi, ci: (qi, 0, ci))
    )
    scores = pl.pallas_call(
        _adc_rescore_kernel,
        grid=(q, sp // ADC_CAND_TILE),
        in_specs=[
            pl.BlockSpec(
                (1, m, K), lambda qi, ci: (qi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, m, ADC_CAND_TILE),
                codes_map,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ADC_CAND_TILE), lambda qi, ci: (qi, 0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ADC_CAND_TILE), lambda qi, ci: (qi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q, 1, sp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * sp * K * m,
            bytes_accessed=q * sp * (m + 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tables_q, cand_codes, bias[:, None, :])[:, 0, :]
    return scores[:, :S]


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def pq_topk(
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    codebooks: jnp.ndarray,  # (m, K, ds) f32
    codes: jnp.ndarray,  # (n, m) int8 (bias -128)
    valid_mask: jnp.ndarray,  # (n,) or (q, n) bool
    k: int,
    impl: str = "",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked ADC top-k: approximate cosine via code tables, exact
    predicate semantics (mask applied before top-k, same contract as
    ``ops.topk.cosine_topk``). Returns (scores (q, k) f32, idx (q, k) i32).

    Routing: corpora of >= ADC_TILE rows take the fused Pallas two-phase
    path (one-hot MXU scoring + bucket maxima, the (n, q) score matrix
    never written to HBM — vs the scan path's m accumulator round-trips);
    smaller corpora and sub-tile mesh shards take the scan path. Both
    score from the same bf16-rounded tables, so results are identical.
    ``impl`` (or ``MMRAG_ADC_IMPL``) = ``scan``/``fused`` overrides — the
    store's runtime-failure ladder retries a failed fused dispatch on the
    scan path via ``impl="scan"``."""

    n = codes.shape[0]
    q = queries.shape[0]
    k = min(k, n)
    override = impl or os.environ.get("MMRAG_ADC_IMPL", "")
    if override != "fused" and (n < ADC_TILE or override == "scan"):
        return _pq_topk_scan(queries, codebooks, codes, valid_mask, k)

    m = codebooks.shape[0]
    qp = max(8, _round_up(q, 8))
    if qp != q:
        queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    tables = jnp.transpose(
        _adc_tables(queries, codebooks), (0, 2, 1)
    ).astype(jnp.bfloat16)  # (m, qp, K)
    np_ = _round_up(n, ADC_TILE)
    if np_ != n:
        codes = jnp.pad(codes, ((0, np_ - n), (0, 0)))
        pad_spec = (
            ((0, 0), (0, np_ - n)) if valid_mask.ndim == 2 else (0, np_ - n)
        )
        valid_mask = jnp.pad(valid_mask, pad_spec)
    if valid_mask.ndim == 2:
        bias = jnp.where(valid_mask, 0.0, NEG_INF).astype(jnp.float32)
        if qp != q:
            bias = jnp.pad(
                bias, ((0, qp - q), (0, 0)), constant_values=float(NEG_INF)
            )
    else:
        bias = jnp.where(valid_mask, 0.0, NEG_INF).astype(jnp.float32)[None, :]

    interpret = jax.default_backend() == "cpu"
    scores, idx = _pq_topk_fused(tables, codes, bias, k, interpret)
    return scores[:q], idx[:q]


def refine_exact(
    queries: np.ndarray,  # (q, d) f32, L2-normalized
    host_rows: np.ndarray,  # (N, d) f32 originals (host RAM)
    cand_idx: np.ndarray,  # (q, c) i32 ADC candidates (may contain -1/fillers)
    cand_scores: np.ndarray,  # (q, c) f32 ADC scores (NEG_INF fillers)
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact host rescore of the ADC shortlist (LanceDB refine_factor role).

    Gathers the candidate originals from host RAM and recomputes true
    cosines — a (q, c, d) numpy contraction over c = k*refine rows, which is
    microseconds next to the device scan. Filler candidates (score <= -1e30)
    keep their sentinel so callers drop them unchanged."""

    q, c = cand_idx.shape
    safe = np.clip(cand_idx, 0, max(len(host_rows) - 1, 0))
    gathered = host_rows[safe]  # (q, c, d)
    exact = np.einsum("qcd,qd->qc", gathered, queries, dtype=np.float32)
    exact = np.where(cand_scores <= float(NEG_INF) / 2, cand_scores, exact)
    order = np.argsort(-exact, axis=1, kind="stable")[:, :k]
    rows = np.arange(q)[:, None]
    return exact[rows, order], cand_idx[rows, order]


# ---------------------------------------------------------------------------
# Convenience container
# ---------------------------------------------------------------------------


@dataclass
class PQData:
    """Trained codebooks + encode/search bound to one index instance."""

    codebooks: jnp.ndarray  # (m, K, ds) f32

    @property
    def m(self) -> int:
        return int(self.codebooks.shape[0])

    def encode(self, rows: jnp.ndarray) -> jnp.ndarray:
        return pq_encode(rows, self.codebooks)

    def reconstruction_cosine(self, rows: jnp.ndarray) -> float:
        """Mean cosine between rows and their PQ reconstruction — the
        quality statistic logged at (re)train time."""

        codes = (self.encode(rows).astype(jnp.int32) + 128).T  # (m, n)
        sub = _split_subvectors(rows.astype(jnp.float32), self.m)  # (m,n,ds)
        recon = jax.vmap(lambda cb, c: jnp.take(cb, c, axis=0))(
            self.codebooks, codes
        )  # (m, n, ds)
        dots = jnp.sum(recon * sub, axis=(0, 2))  # (n,)
        norms = jnp.sqrt(jnp.sum(recon * recon, axis=(0, 2)))
        return float(jnp.mean(dots / jnp.maximum(norms, 1e-12)))
