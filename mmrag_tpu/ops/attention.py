"""Fused multi-head self-attention for short-sequence encoders (Pallas TPU).

The encoder family here (MiniLM seq<=512, CLIP-text seq 77, ViT-B/32 seq 50)
has sequences short enough that a whole (batch-tile, seq, hidden) slice fits
in VMEM — so attention needs NO flash-style online softmax and, more
importantly, NO HBM round-trips. The XLA path materializes the f32 score
tensor (b, heads, s, s) and physically transposes q/k/v/ctx between
(b, s, h, d) and (b, h, s, d) layouts each layer; measured on-chip that makes
attention ~65% of MiniLM wall time while executing ~4% of its FLOPs.

This kernel keeps q/k/v in their natural (b, s, hidden) layout, loops heads
statically inside VMEM (lane-slices of the hidden dim), computes scores +
f32 softmax + context per head without leaving VMEM, and writes only the
final (b, s, hidden) context back to HBM.

Reference equivalent: torch SDPA inside sentence-transformers / CLIP
(``/root/reference/app/ml/embeddings.py:52-105`` library internals).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_fused(batch: int = 1 << 30, seq: int = 0) -> bool:
    """Whether encoders should route through the fused kernel.

    Default: fused on accelerators when the batch carries enough parallel
    work (``batch * seq >= 4096``) — below that (e.g. rerank depth-8 pairs,
    single-query serving) the XLA einsum path measures faster because the
    kernel's per-head loop can't fill the chip — for the whole encoder
    sequence range (``seq <= 512``, the indexing chunk length). The old
    ``seq <= 256`` gate predated the key-row mask: with the (b, s, s) bias
    materialized, seq 512 measured 4% slower than XLA; with the mask kept as
    a (b, 1, s) key row expanded in-VMEM, the kernel wins 2.3x at seq 512
    (7.35k vs 3.24k embeds/s, b=64 v5e) and 1.67x at seq 256 (16.8k vs
    10.0k, b=128). Always XLA on CPU (interpret-mode Pallas would be pure
    overhead for real serving). ``MMRAG_ATTN_IMPL=fused`` forces the kernel
    (interpret mode on CPU — how tests exercise it); ``MMRAG_ATTN_IMPL=xla``
    forces the einsum path.
    """

    override = os.environ.get("MMRAG_ATTN_IMPL", "")
    if override == "fused":
        return True
    if override == "xla":
        return False
    return (
        jax.default_backend() == "tpu" and batch * seq >= 4096 and seq <= 512
    )


# exp-overflow guard for the no-max-subtraction softmax (see _softmax_ctx):
# exp(80) = 5.5e34 and a full s=512 row of them sums to 2.8e37 < f32 max.
# Real encoder logits never approach 80; masked entries carry -1e9 -> exp 0.
_LOGIT_CAP = 80.0


def _softmax_ctx(scores, vh, ones, precision):
    """``softmax(scores) @ V`` without the two most expensive VPU passes.

    Measured on v5e (MiniLM block kernel, b=512 s=64): the textbook
    max-subtract + exp + sum + reciprocal-multiply softmax costs ~200us/layer
    of pure VPU work on the (tile, s, s) score tensor. This form cuts it to
    one ``exp`` pass:

      * **No max subtraction.** exp(scores) is overflow-safe because scores
        are capped at ``_LOGIT_CAP`` first (one fused ``min``); softmax is
        shift-invariant so results are bit-comparable for all real logits,
        and rows whose true max exceeds the cap degrade gracefully (their
        over-cap logits flatten to equal weight).
      * **Denominator rides the MXU.** V is augmented with an all-ones block
        ([V | 1]) so the context matmul also produces the row sums - with
        head_dim < 128 the extra lanes were idle anyway. Normalization then
        runs on the (s, hd) context instead of the (s, s) probabilities.
      * A fully-masked row (all keys -1e9: batch padding) yields denom 0,
        clamped to 1e-30 -> ctx exactly 0. (The composed XLA path returns
        the uniform mean of V there; both are discarded by masked pooling.)

    Unnormalized probabilities are cast to the V dtype before the dot - the
    same rounding the normalized form applies (ratios preserved; bf16 spans
    e80 comfortably); accumulation stays f32.
    """

    hd = vh.shape[-1]
    p = jnp.exp(jnp.minimum(scores, _LOGIT_CAP))
    vaug = jnp.concatenate([vh, ones], axis=-1)
    ch = jax.lax.dot_general(
        p.astype(vh.dtype), vaug,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    denom = jnp.maximum(ch[..., hd:hd + 1], 1e-30)
    return ch[..., :hd] * pl.reciprocal(denom, approx=False)


def _batch_tile(seq: int, itemsize: int = 2, hidden: int = 384) -> int:
    # VMEM budget: ~4 * tile * seq * hidden * itemsize (qkv+out, double-
    # buffered) + tile * seq^2 f32 (one head's score tensor). Shrink with
    # seq, and halve for f32 inputs (a 16-tile f32 MiniLM block compiles to
    # 34 MB scoped VMEM vs the 16 MB limit). tile=32 bf16 at seq 64 measured
    # the same speed but sat within 56KB of the cliff — 16 keeps headroom.
    # Past seq 128 throughput is tile-INSENSITIVE now that the mask is a
    # (tile, 1, s) key row instead of a (tile, s, s) bias block (measured
    # seq 256 b=128: 16.8k emb/s for tiles 1/2/4/8; seq 512 b=64: 7.3k for
    # all) — tile 2 keeps the old safe VMEM margin with nothing to gain
    # from larger tiles.
    if seq <= 128:
        tile = 16
    else:
        tile = 2
    if hidden > 512:
        # wide towers (CLIP ViT h=768): tile 16 at seq 56 compiled at
        # 17.23 MB scoped VMEM vs the 16 MB limit — i.e. only when the
        # remote compiler's flaky accounting smiled (b=128 passed, b=256
        # OOMed). tile 8 sits ~10 MB with real margin.
        tile = max(1, tile // 2)
    if itemsize > 2:
        tile = max(1, tile // 2)
    return tile


def _select_kernel(seq: int, head_dim: int, itemsize: int = 2, hidden: int = 384):
    """Kernel variant + batch tile for this shape.

    (A block-diagonal variant — flattening samples into one dense
    (tile*s, tile*s) matmul per head — was measured and REMOVED: the
    tile-x larger softmax/mask work is VPU-bound and cost more than the
    tiny batched matmuls it replaced: MiniLM 42.6k -> 37.1k, CLIP 16.7k
    -> 10.8k embeds/s on v5e.)
    """

    return _attn_kernel, _batch_tile(seq, itemsize, hidden)


def _attn_kernel2d(
    q_ref, k_ref, v_ref, kmask_ref, out_ref, *, num_heads: int, seq: int, scale: float
):
    """2-D layout variant: q/k/v/out are (tile*seq, hidden) row-major blocks.

    Rationale (measured via op-profile): the 3-D kernel's {2,1,0} operand
    layout constraint fought XLA's preferred {0,2,1} activation layout — the
    surrounding LayerNorm fusions spent ~57% of MiniLM wall time on layout
    transposes. With 2-D operands every producer/consumer already agrees on
    row-major, so the constraint costs nothing; the (tile, seq) split happens
    in-VMEM (a major-dim reshape, free).

    The mask arrives as a (tile, s) additive KEY row, expanded to (tile, s, s)
    in-VMEM: encoder padding masks are rank-1 along the query dim, and the
    materialized (b, s, s) bias was the seq-512 bottleneck — 1 MB/sample of
    HBM traffic (vs 1.2 MB for q+k+v combined) and the VMEM hog that forced
    the batch tile down to 2 (_batch_tile note).
    """

    rows, h = q_ref.shape
    tile = rows // seq
    hd = h // num_heads
    kbias = kmask_ref[:]  # (tile, 1, s) -> broadcasts over queries
    precision = (
        jax.lax.Precision.DEFAULT
        if q_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    ones = jnp.ones((tile, seq, hd), q_ref.dtype)
    for n in range(num_heads):
        sl = slice(n * hd, (n + 1) * hd)
        qh = q_ref[:, sl].reshape(tile, seq, hd)
        kh = k_ref[:, sl].reshape(tile, seq, hd)
        vh = v_ref[:, sl].reshape(tile, seq, hd)
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ctx = _softmax_ctx(scores * scale + kbias, vh, ones, precision)
        out_ref[:, sl] = ctx.reshape(rows, hd).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "seq", "interpret"))
def _fused_attention2d(
    q: jnp.ndarray,  # (b*s, hidden) row-major
    k: jnp.ndarray,
    v: jnp.ndarray,
    kmask: jnp.ndarray,  # (b, 1, s) f32 additive key mask
    num_heads: int,
    seq: int,
    interpret: bool,
) -> jnp.ndarray:
    rows, h = q.shape
    b = rows // seq
    hd = h // num_heads
    _, tile = _select_kernel(seq, hd, q.dtype.itemsize, h)
    tile = min(tile, b)
    grid = (b // tile,)
    kernel = functools.partial(
        _attn_kernel2d, num_heads=num_heads, seq=seq, scale=float(hd) ** -0.5
    )
    qkv_spec = pl.BlockSpec(
        (tile * seq, h), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((tile, 1, seq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * num_heads * seq * hd,
            bytes_accessed=4 * rows * h * q.dtype.itemsize + b * seq * 4,
            transcendentals=rows * num_heads * seq,
        ),
        interpret=interpret,
    )(q, k, v, kmask)


def fused_encoder_attention2d(
    q: jnp.ndarray,  # (b*s, hidden)
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    seq: int,
    attention_mask: Optional[jnp.ndarray] = None,  # (b, s) {0,1}
) -> jnp.ndarray:
    """2-D-activation form of :func:`fused_encoder_attention` — same math,
    operands stay (b*s, hidden) row-major so no layout transposes are forced
    at the kernel boundary, and the key-padding mask stays a (b, s) row
    (expanded in-VMEM) instead of a materialized (b, s, s) bias. Pads the
    batch to a tile multiple internally. Structural (e.g. causal) biases
    belong on :func:`fused_encoder_attention`."""

    rows, h = q.shape
    if rows % seq:
        raise ValueError(f"rows {rows} not divisible by seq {seq}")
    if h % num_heads:
        raise ValueError(f"hidden {h} not divisible by heads {num_heads}")
    b = rows // seq
    if attention_mask is not None:
        kmask = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, :]
    else:
        kmask = jnp.zeros((b, 1, seq), jnp.float32)
    _, tile = _select_kernel(seq, h // num_heads, q.dtype.itemsize, h)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        q = jnp.pad(q, ((0, pad * seq), (0, 0)))
        k = jnp.pad(k, ((0, pad * seq), (0, 0)))
        v = jnp.pad(v, ((0, pad * seq), (0, 0)))
        kmask = jnp.pad(kmask, ((0, pad), (0, 0), (0, 0)))
    interpret = jax.default_backend() == "cpu"
    out = _fused_attention2d(q, k, v, kmask, num_heads, seq, interpret)
    return out[:rows]


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, num_heads: int, scale: float):
    hd = q_ref.shape[-1] // num_heads
    bias = bias_ref[:]  # (tile, s, s) f32 additive (padding and/or causal)
    # same precision contract as the einsum path (models/bert.py _precision):
    # bf16 takes the native one-pass MXU; f32 must stay full-precision for
    # the <=1e-3 parity budget
    precision = (
        jax.lax.Precision.DEFAULT
        if q_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    tile, s, _ = q_ref.shape
    ones = jnp.ones((tile, s, hd), q_ref.dtype)
    for n in range(num_heads):
        sl = slice(n * hd, (n + 1) * hd)
        qh, kh, vh = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (tile, s, s)
        ctx = _softmax_ctx(scores * scale + bias, vh, ones, precision)
        out_ref[:, :, sl] = ctx.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_attention(
    q: jnp.ndarray,  # (b, s, hidden)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (b, s, s) f32 additive
    num_heads: int,
    interpret: bool,
) -> jnp.ndarray:
    b, s, h = q.shape
    hd = h // num_heads
    kernel_fn, tile = _select_kernel(s, hd, q.dtype.itemsize, h)
    tile = min(tile, b)
    grid = (b // tile,)
    kernel = functools.partial(
        kernel_fn, num_heads=num_heads, scale=float(hd) ** -0.5
    )
    qkv_spec = pl.BlockSpec((tile, s, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((tile, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, h), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * hd,
            bytes_accessed=4 * b * s * h * q.dtype.itemsize + b * s * s * 4,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(q, k, v, bias)


def fused_encoder_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    attention_mask: Optional[jnp.ndarray] = None,  # (b, s) {0,1} key padding
    bias: Optional[jnp.ndarray] = None,  # (b, s, s) or (s, s) f32 additive
) -> jnp.ndarray:
    """Multi-head attention over (b, s, hidden) q/k/v without HBM spills.

    Returns the merged-head context (b, s, hidden) in ``q.dtype``. Scores are
    scaled by ``head_dim**-0.5``; masking follows the HF additive convention
    (-1e9). Pass ``attention_mask`` for key padding and/or ``bias`` for
    arbitrary structure (e.g. CLIP-text causal). Pads the batch to a tile
    multiple internally; runs in interpret mode off-TPU so CPU tests exercise
    the identical kernel.
    """

    b, s, h = q.shape
    if h % num_heads:
        raise ValueError(f"hidden {h} not divisible by heads {num_heads}")
    full = jnp.zeros((b, s, s), jnp.float32)
    if bias is not None:
        full = full + bias.astype(jnp.float32)
    if attention_mask is not None:
        full = full + (1.0 - attention_mask.astype(jnp.float32))[:, None, :] * -1e9
    _, tile = _select_kernel(s, h // num_heads, q.dtype.itemsize, h)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        full = jnp.pad(full, ((0, pad), (0, 0), (0, 0)))
    interpret = jax.default_backend() == "cpu"
    out = _fused_attention(q, k, v, full, num_heads, interpret)
    return out[:b]


def _attn_block_kernel(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    lns_ref, lnb_ref, kmask_ref, out_ref, *, num_heads: int, seq: int,
    scale: float, eps: float, pre_ln: bool = False,
):
    """Whole attention block in VMEM: qkv projections, per-head attention,
    output projection, residual. ``pre_ln=False`` (BERT-style post-LN):
    writes ``LN(x + Attn(x))``. ``pre_ln=True`` (CLIP-style): writes
    ``x + Attn(LN(x))``. Either way HBM traffic per tile = read x + weights,
    write one stream — the q/k/v/ctx tensors never leave the chip."""

    rows, h = x_ref.shape
    tile = rows // seq
    hd = h // num_heads
    x = x_ref[:]
    precision = (
        jax.lax.Precision.DEFAULT
        if x.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def ln(y):  # f32 statistics, eps inside rsqrt (HF LN numerics)
        y = y.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]

    a_in = ln(x).astype(x.dtype) if pre_ln else x

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            a_in, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) + b_ref[:]
        return y.astype(x.dtype)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    bias = kmask_ref[:]  # (tile, 1, s) key row, broadcast in-VMEM
    ones = jnp.ones((tile, seq, hd), x.dtype)
    ctx_cols = []
    for n in range(num_heads):
        sl = slice(n * hd, (n + 1) * hd)
        qh = q[:, sl].reshape(tile, seq, hd)
        kh = k[:, sl].reshape(tile, seq, hd)
        vh = v[:, sl].reshape(tile, seq, hd)
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ch = _softmax_ctx(scores * scale + bias, vh, ones, precision)
        ctx_cols.append(ch.reshape(rows, hd).astype(x.dtype))
    ctx = jnp.concatenate(ctx_cols, axis=-1)  # (rows, h)
    o = jax.lax.dot_general(
        ctx, wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) + bo_ref[:]
    y = x.astype(jnp.float32) + o  # residual in f32
    out = y if pre_ln else ln(y)
    out_ref[:] = out.astype(out_ref.dtype)


def _attn_block_kernel_q8(
    x_ref, wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
    wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
    lns_ref, lnb_ref, kmask_ref, out_ref, *, num_heads: int, seq: int,
    scale: float, eps: float, pre_ln: bool = False,
):
    """W8A8 variant of :func:`_attn_block_kernel`: the four (h, h)
    projections run int8 x int8 -> int32 on the MXU double-rate path
    (:mod:`mmrag_tpu.ops.quant` scheme — per-row activation scales computed
    in-kernel, per-channel weight scales fused into the f32 dequant
    epilogue). The MHA itself stays bf16 with the one-pass softmax.

    NEGATIVE (measured, seq-512 MiniLM b=64 v5e): int8-ing the MHA matmuls
    too — the part that dominates at long seq because head_dim 32 leaves the
    MXU contraction 75% idle — LOSES. Full int8 MHA (per-row q/k scales,
    per-query-row p scales, per-column V scales): 5986 emb/s; int8 scores
    only (rank-1 outer dequant): 8303; this bf16-MHA form: 8672-8698
    across runs (vs 8349 bf16 unquantized). The int8 operands' (32, 128)-
    tile repacking and the extra s^2-sized dequant / quantize VPU passes
    cost more than the double-rate path saves at K=32.
    """

    from .quant import quantize_rows

    rows, h = x_ref.shape
    tile = rows // seq
    hd = h // num_heads
    x = x_ref[:]
    mm_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    precision = (
        jax.lax.Precision.DEFAULT
        if mm_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def ln(y):
        y = y.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]

    a_in = ln(x) if pre_ln else x.astype(jnp.float32)
    aq, ascale = quantize_rows(a_in)

    def qproj(w_ref, s_ref, b_ref):
        acc = jax.lax.dot_general(
            aq, w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * ascale * s_ref[:] + b_ref[:]
        return y.astype(mm_dtype)

    bias = kmask_ref[:]  # (tile, 1, s) key row, broadcast in-VMEM
    ctx_cols = []
    q = qproj(wq_ref, sq_ref, bq_ref)
    k = qproj(wk_ref, sk_ref, bk_ref)
    v = qproj(wv_ref, sv_ref, bv_ref)
    ones = jnp.ones((tile, seq, hd), mm_dtype)
    for n in range(num_heads):
        sl = slice(n * hd, (n + 1) * hd)
        qh = q[:, sl].reshape(tile, seq, hd)
        kh = k[:, sl].reshape(tile, seq, hd)
        vh = v[:, sl].reshape(tile, seq, hd)
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ch = _softmax_ctx(scores * scale + bias, vh, ones, precision)
        ctx_cols.append(ch.reshape(rows, hd))  # f32
    ctx = jnp.concatenate(ctx_cols, axis=-1)  # (rows, h) f32
    cq, cscale = quantize_rows(ctx)
    acc = jax.lax.dot_general(
        cq, wo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = acc.astype(jnp.float32) * cscale * so_ref[:] + bo_ref[:]
    y = x.astype(jnp.float32) + o  # residual in f32
    out = y if pre_ln else ln(y)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "seq", "eps", "interpret", "pre_ln"))
def _fused_attention_block_q8(
    x, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo, ln_scale, ln_bias,
    kmask, num_heads: int, seq: int, eps: float, interpret: bool,
    pre_ln: bool = False,
):
    rows, h = x.shape
    b = rows // seq
    hd = h // num_heads
    _, tile = _select_kernel(seq, hd, x.dtype.itemsize, h)
    tile = min(tile, b)
    grid = (b // tile,)
    kernel = functools.partial(
        _attn_block_kernel_q8, num_heads=num_heads, seq=seq,
        scale=float(hd) ** -0.5, eps=eps, pre_ln=pre_ln,
    )
    row_spec = pl.BlockSpec((tile * seq, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec,
            w_spec, v_spec, v_spec,  # wq, scale, bias
            w_spec, v_spec, v_spec,
            w_spec, v_spec, v_spec,
            w_spec, v_spec, v_spec,
            v_spec, v_spec,
            pl.BlockSpec((tile, 1, seq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(8 * rows * h * h) + (4 * rows * num_heads * seq * hd),
            bytes_accessed=2 * rows * h * x.dtype.itemsize + 4 * h * h,
            transcendentals=rows * num_heads * seq + rows,
        ),
        interpret=interpret,
    )(x, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo, ln_scale, ln_bias, kmask)


def fused_attention_block_q8(
    x: jnp.ndarray,  # (b*s, h) residual stream
    qlayer: dict,  # quantize_encoder_layer() pytree (int8 linears + LN)
    num_heads: int,
    seq: int,
    eps: float,
    attention_mask: Optional[jnp.ndarray] = None,  # (b, s)
    pre_ln: bool = False,
    ln_key: str = "attn_ln",
) -> jnp.ndarray:
    """W8A8 form of :func:`fused_attention_block` (opt-in,
    ``TPU_ENCODER_QUANT=int8``): same block fusion, the four projections on
    the MXU's int8 double-rate path; the MHA stays bf16 (int8 MHA measured
    slower — see the kernel docstring's NEGATIVE note). See ops/quant.py
    for the scheme and accuracy contract."""

    rows, h = x.shape
    b = rows // seq
    if attention_mask is None:
        kmask = jnp.zeros((b, 1, seq), jnp.float32)
    else:
        kmask = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, :]
    _, tile = _select_kernel(seq, h // num_heads, x.dtype.itemsize, h)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        x = jnp.pad(x, ((0, pad * seq), (0, 0)))
        kmask = jnp.pad(kmask, ((0, pad), (0, 0), (0, 0)))
    interpret = jax.default_backend() == "cpu"
    two_d = lambda p: p.reshape(1, -1)
    out = _fused_attention_block_q8(
        x,
        qlayer["q"]["q"], qlayer["q"]["scale"], qlayer["q"]["bias"],
        qlayer["k"]["q"], qlayer["k"]["scale"], qlayer["k"]["bias"],
        qlayer["v"]["q"], qlayer["v"]["scale"], qlayer["v"]["bias"],
        qlayer["attn_out"]["q"], qlayer["attn_out"]["scale"],
        qlayer["attn_out"]["bias"],
        two_d(qlayer[ln_key]["scale"]), two_d(qlayer[ln_key]["bias"]),
        kmask, num_heads, seq, eps, interpret, pre_ln,
    )
    return out[:rows]


@functools.partial(jax.jit, static_argnames=("num_heads", "seq", "eps", "interpret", "pre_ln"))
def _fused_attention_block(
    x, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias, kmask,
    num_heads: int, seq: int, eps: float, interpret: bool, pre_ln: bool = False,
):
    rows, h = x.shape
    b = rows // seq
    hd = h // num_heads
    _, tile = _select_kernel(seq, hd, x.dtype.itemsize, h)
    tile = min(tile, b)
    grid = (b // tile,)
    kernel = functools.partial(
        _attn_block_kernel, num_heads=num_heads, seq=seq,
        scale=float(hd) ** -0.5, eps=eps, pre_ln=pre_ln,
    )
    row_spec = pl.BlockSpec((tile * seq, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec,
            w_spec, v_spec, w_spec, v_spec, w_spec, v_spec, w_spec, v_spec,
            v_spec, v_spec,
            pl.BlockSpec((tile, 1, seq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(8 * rows * h * h) + (4 * rows * num_heads * seq * hd),
            bytes_accessed=2 * rows * h * x.dtype.itemsize + 4 * h * h * 4,
            transcendentals=rows * num_heads * seq + rows,
        ),
        interpret=interpret,
    )(x, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias, kmask)


def fused_attention_block(
    x: jnp.ndarray,  # (b*s, h) residual stream
    layer: dict,  # {"q"/"k"/"v"/"attn_out": {kernel,bias}, ln under `ln_key`}
    num_heads: int,
    seq: int,
    eps: float,
    attention_mask: Optional[jnp.ndarray] = None,  # (b, s)
    pre_ln: bool = False,
    ln_key: str = "attn_ln",
) -> jnp.ndarray:
    """One dispatch for the full attention block with q/k/v/ctx resident in
    VMEM — ``LN(x + AttnOut(MHA(x)))`` post-LN (BERT, default) or
    ``x + AttnOut(MHA(LN(x)))`` pre-LN (CLIP, ``pre_ln=True`` with
    ``ln_key="ln1"``). Saves the six (b*s, h) HBM round-trips the composed
    form pays per layer."""

    rows, h = x.shape
    b = rows // seq
    if attention_mask is None:
        kmask = jnp.zeros((b, 1, seq), jnp.float32)
    else:
        kmask = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, :]
    _, tile = _select_kernel(seq, h // num_heads, x.dtype.itemsize, h)
    tile = min(tile, b)
    pad = (-b) % tile
    if pad:
        x = jnp.pad(x, ((0, pad * seq), (0, 0)))
        kmask = jnp.pad(kmask, ((0, pad), (0, 0), (0, 0)))
    interpret = jax.default_backend() == "cpu"
    two_d = lambda p: p.reshape(1, -1)
    out = _fused_attention_block(
        x,
        layer["q"]["kernel"].astype(x.dtype), two_d(layer["q"]["bias"]),
        layer["k"]["kernel"].astype(x.dtype), two_d(layer["k"]["bias"]),
        layer["v"]["kernel"].astype(x.dtype), two_d(layer["v"]["bias"]),
        layer["attn_out"]["kernel"].astype(x.dtype), two_d(layer["attn_out"]["bias"]),
        two_d(layer[ln_key]["scale"]), two_d(layer[ln_key]["bias"]),
        kmask, num_heads, seq, eps, interpret, pre_ln,
    )
    return out[:rows]

