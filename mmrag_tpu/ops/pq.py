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
  * **ADC as lax.scan of small-table gathers** (XLA path): per subvector,
    ``scores += table[m][codes[:, m]]`` — the (K, q) tables are tiny and the
    accumulator is the only large operand. A one-hot-matmul Pallas variant
    (tables resident in VMEM, one-hot never touching HBM) is the headline
    kernel once measured; the scan path is the correct-everywhere fallback.
  * **Exact refine on host**: ADC returns ``k * refine`` candidates; the
    caller rescores them against the host-RAM originals (a (q, k*refine, d)
    numpy matmul — microseconds) and keeps the true top-k. This is LanceDB's
    ``refine_factor`` role and is what holds recall at ~exact levels.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
        # ceil stride: floor would give stride 1 for n < 2*train_sample and
        # silently train on a first-rows PREFIX (insertion order is
        # per-tenant, so a later tenant's geometry would go unseen)
        train = rows[:: -(-n // train_sample)][:train_sample]
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
def pq_topk(
    queries: jnp.ndarray,  # (q, d) f32, L2-normalized
    codebooks: jnp.ndarray,  # (m, K, ds) f32
    codes: jnp.ndarray,  # (n, m) int8 (bias -128)
    valid_mask: jnp.ndarray,  # (n,) or (q, n) bool
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked ADC top-k: approximate cosine via code tables, exact
    predicate semantics (mask applied before top-k, same contract as
    ``ops.topk.cosine_topk``). Returns (scores (q, k) f32, idx (q, k) i32).

    The scan carries ONLY the (n, q) f32 accumulator; each step gathers
    from a (K, q) table with (n,) codes — no (n, m, K) one-hot ever
    materializes, and the int8 codes upcast per step (an (n,) int32
    transient), so peak search HBM is the m-byte code slab + ~8q B/row of
    accumulator/top-k working set, not a resident 4m B/row int32 copy.
    """

    n = codes.shape[0]
    q = queries.shape[0]
    tables = _adc_tables(queries, codebooks)  # (m, K, q)
    codes_t = codes.T  # (m, n) int8 — same bytes as the code slab

    def step(acc, inputs):
        table, c = inputs  # (K, q) f32, (n,) int8
        return acc + jnp.take(table, c.astype(jnp.int32) + 128, axis=0), None

    scores, _ = jax.lax.scan(
        step, jnp.zeros((n, q), jnp.float32), (tables, codes_t)
    )
    scores = scores.T  # (q, n)
    mask = valid_mask if valid_mask.ndim == 2 else valid_mask[None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


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
