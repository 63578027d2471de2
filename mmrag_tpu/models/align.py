"""Word-level transcript alignment — the WhisperX-align equivalent.

The reference's first ASR ladder rung loads a separate WhisperX wav2vec
alignment model to attach word-level timestamps to whisper segments
(``/root/reference/app/ingest/youtube.py:156-157``). This module closes
that capability gap TPU-natively without a second model (VERDICT r3 item
8): a teacher-forced decoder pass over the already-decoded tokens (JAX, on
device, one batched matmul pass) captures the decoder's cross-attention
over encoder frames, and a host-side DTW over the averaged/filtered
attention recovers the monotonic token->frame alignment; tokens then
regroup into words via the byte-level BPE vocab. This is the same
attention-DTW construction OpenAI whisper uses for ``word_timestamps=True``
— WhisperX's separate wav2vec aligner exists mainly because its ct2
backend does not expose attention.

The DTW itself stays on the host on purpose: it is a sequential recurrence
over an (<=448 tokens x 1500 frames) grid — a shape XLA cannot tile onto
the MXU without serializing anyway, and one the row-vectorized numpy sweep
(a cumsum + prefix-min identity per token row; see ``dtw_monotonic``)
clears in single-digit milliseconds per 30 s window. The FLOPs (the
teacher-forced decoder pass) run on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .whisper import (
    HOP_LENGTH,
    SAMPLE_RATE,
    WhisperConfig,
    _dense,
    _gelu,
    _layer_norm,
    _mha,
    _precision,
)

# one encoder state covers conv-stride-2 x hop samples
FRAME_SECONDS = 2 * HOP_LENGTH / SAMPLE_RATE  # 0.02 s


def decoder_cross_attention(
    params,
    token_ids,  # (b, s) int32
    enc_states,  # (b, frames, d)
    cfg: WhisperConfig,
    compute_dtype=None,
):
    """Teacher-forced decoder pass that also returns cross-attention probs.

    Returns ``(logits (b, s, vocab), cross (layers, b, heads, s, frames))``
    — the logits path is identical to
    :func:`mmrag_tpu.models.whisper.whisper_decode_logits` (pinned by test)
    so the capture can never drift from the production decoder.
    """

    import jax
    import jax.numpy as jnp

    if compute_dtype is None:
        compute_dtype = jnp.float32
    dec = params["decoder"]
    b, s = token_ids.shape
    x = dec["token_embedding"][token_ids] + dec["positions"][None, :s]
    causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
    cross_layers = []
    for layer in dec["layers"]:
        h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
        x = x + _mha(layer["self_attn"], h, h, cfg.decoder_heads, causal,
                     compute_dtype)
        h = _layer_norm(layer["ln_cross"], x, cfg.layer_norm_eps)
        # inline cross-attention so the softmax probs are capturable; the
        # math matches whisper._mha exactly (q pre-scaled, f32 softmax)
        attn = layer["cross_attn"]
        sk = enc_states.shape[1]
        hd = cfg.d_model // cfg.decoder_heads
        q = _dense(attn["q"], h, compute_dtype).reshape(
            b, s, cfg.decoder_heads, hd) * (hd ** -0.5)
        k = _dense(attn["k"], enc_states, compute_dtype).reshape(
            b, sk, cfg.decoder_heads, hd)
        v = _dense(attn["v"], enc_states, compute_dtype).reshape(
            b, sk, cfg.decoder_heads, hd)
        scores = jnp.einsum(
            "bqnd,bknd->bnqk", q.astype(compute_dtype), k.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=_precision(compute_dtype))
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum(
            "bnqk,bknd->bqnd", probs.astype(compute_dtype),
            v.astype(compute_dtype), preferred_element_type=jnp.float32,
            precision=_precision(compute_dtype))
        x = x + _dense(attn["out"], ctx.reshape(b, s, cfg.d_model),
                       compute_dtype)
        cross_layers.append(probs)
        h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
        x = x + _dense(layer["fc2"], _gelu(_dense(layer["fc1"], h,
                                                  compute_dtype)),
                       compute_dtype)
    x = _layer_norm(dec["final_ln"], x, cfg.layer_norm_eps)
    logits = jnp.dot(x, dec["token_embedding"].T.astype(x.dtype),
                     preferred_element_type=jnp.float32,
                     precision=_precision(compute_dtype))
    return logits, jnp.stack(cross_layers)


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (frames), edge-padded. Smooths the
    per-token attention before DTW, like openai-whisper's
    ``median_filter(weights, 7)``."""

    if width <= 1:
        return x
    half = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)], mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)


def attention_alignment_matrix(
    cross: np.ndarray,  # (layers, heads, s_tokens, frames) — one window
    layer_slice: Optional[slice] = None,
) -> np.ndarray:
    """Average selected heads into one (s_tokens, frames) alignment matrix.

    Without whisper's learned alignment-head mask (not shipped with the
    checkpoints we convert), the standard heuristic applies: the top half
    of decoder layers carries the alignment signal. Each head's weights
    are z-normalized per token over frames (so confident heads do not
    drown the rest), median-filtered over frames, then averaged.
    """

    n_layers = cross.shape[0]
    sel = cross[layer_slice if layer_slice is not None
                else slice(n_layers // 2, n_layers)]
    w = sel.reshape(-1, sel.shape[-2], sel.shape[-1])  # (picked_heads, s, f)
    std = w.std(axis=-1, keepdims=True)
    w = (w - w.mean(axis=-1, keepdims=True)) / np.where(std < 1e-9, 1.0, std)
    w = _median_filter(w, 7)
    return w.mean(axis=0)


def alignment_matrix_device(cross, layer_slice: Optional[slice] = None):
    """:func:`attention_alignment_matrix` in jnp, to run INSIDE the capture
    jit: z-norm per token over frames, median-filter(7) over frames, mean
    over the selected heads — so only the reduced ``(s_tokens, frames)``
    matrix crosses the tunnel. The raw ``(layers, heads, s, f)`` cross
    tensor is ~128 MB per 30 s window at whisper-base (6x8x448x1500 f32);
    reading it back dominated the aligned path's wall clock (48x the
    reduced matrix's 2.7 MB)."""

    import jax.numpy as jnp

    n_layers = cross.shape[0]
    sel = cross[layer_slice if layer_slice is not None
                else slice(n_layers // 2, n_layers)]
    w = sel.reshape(-1, sel.shape[-2], sel.shape[-1]).astype(jnp.float32)
    std = w.std(axis=-1, keepdims=True)
    w = (w - w.mean(axis=-1, keepdims=True)) / jnp.where(std < 1e-9, 1.0, std)
    # median filter width 7, edge-padded (matches _median_filter)
    half = 3
    xp = jnp.pad(w, ((0, 0), (0, 0), (half, half)), mode="edge")
    m = w.shape[-1]
    windows = jnp.stack([xp[..., i:i + m] for i in range(2 * half + 1)], -1)
    w = jnp.median(windows, axis=-1)
    return w.mean(axis=0)


def dtw_monotonic(cost: np.ndarray) -> List[Tuple[int, int]]:
    """Classic 3-move DTW over ``cost (N, M)``; returns the optimal
    monotonic path [(token_row, frame_col), ...] from (0,0) to (N-1,M-1)."""

    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf, np.float64)
    acc[0, 0] = 0.0
    # fully vectorized row sweep (one O(M) numpy pass per token row — no
    # Python inner loop over the 1500 frames): within a row the recurrence
    #   cur[j] = row[j] + min(best_prev[j], cur[j-1])
    # unrolls to  cur[j] = P[j] + min_{k<=j} (best_prev[k] - P[k-1])
    # with P = cumsum(row), i.e. a prefix sum plus a running prefix-min
    # (np.minimum.accumulate). inf entries in best_prev (unreached cells)
    # stay inf through the subtraction and never win the min.
    for i in range(1, n + 1):
        best_prev = np.minimum(acc[i - 1, :-1], acc[i - 1, 1:])
        p = np.cumsum(cost[i - 1], dtype=np.float64)
        p_prev = np.concatenate(([0.0], p[:-1]))
        acc[i, 1:] = p + np.minimum.accumulate(best_prev - p_prev)
    # backtrack, preferring the diagonal on ties
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        step = int(np.argmin(moves))
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return path


def token_frame_spans(matrix: np.ndarray) -> np.ndarray:
    """(s_tokens, frames) alignment matrix -> (s_tokens, 2) [start, end)
    frame spans via DTW over ``-matrix``."""

    path = dtw_monotonic(-matrix.astype(np.float64))
    n = matrix.shape[0]
    spans = np.zeros((n, 2), np.int64)
    seen = np.zeros(n, bool)
    for tok, frame in path:
        if not seen[tok]:
            spans[tok, 0] = frame
            seen[tok] = True
        spans[tok, 1] = frame + 1
    return spans


@dataclass(frozen=True)
class WordSpan:
    word: str
    start: float  # seconds, absolute (offset applied)
    end: float


def group_words(
    token_ids: Sequence[int],
    spans: np.ndarray,  # (len(token_ids), 2) frame spans
    decoder,  # ByteLevelBPEDecoder
    time_offset: float = 0.0,
) -> List[WordSpan]:
    """Merge aligned text tokens into words.

    A token starts a new word when its vocab string begins with the
    byte-level space symbol (GPT-2 mapping: 0x20 -> 'Ġ'); special tokens
    (>= the decoder's special_base) never reach here — callers pass text
    tokens only.
    """

    from .tokenizer import _bytes_to_unicode

    space_sym = _bytes_to_unicode()[0x20]
    words: List[WordSpan] = []
    group: List[int] = []
    g_start = g_end = 0
    for idx, tid in enumerate(token_ids):
        piece = decoder.id_to_token.get(int(tid), "")
        starts_word = piece.startswith(space_sym)
        if group and starts_word:
            text = decoder.decode(group).strip()
            if text:
                words.append(WordSpan(
                    text, time_offset + g_start * FRAME_SECONDS,
                    time_offset + g_end * FRAME_SECONDS))
            group = []
        if not group:
            g_start = int(spans[idx, 0])
        group.append(int(tid))
        g_end = int(spans[idx, 1])
    if group:
        text = decoder.decode(group).strip()
        if text:
            words.append(WordSpan(
                text, time_offset + g_start * FRAME_SECONDS,
                time_offset + g_end * FRAME_SECONDS))
    return words


def words_from_cross(
    cross_np: np.ndarray,  # (layers, heads, s_tokens, frames) — one window
    tokens: Sequence[int],  # the s_tokens consumed tokens, prefix included
    decoder,  # ByteLevelBPEDecoder
    cfg: WhisperConfig,
    time_offset: float = 0.0,
) -> List[WordSpan]:
    """Host half of the aligner: averaged-attention matrix -> DTW over the
    TEXT-token rows -> word grouping. Used by the runtime, which captures
    ``cross_np`` inside its own jitted program."""

    return words_from_matrix(attention_alignment_matrix(cross_np), tokens,
                             decoder, cfg, time_offset=time_offset)


def words_from_matrix(
    matrix: np.ndarray,  # (s_tokens, frames) — reduced alignment matrix
    tokens: Sequence[int],
    decoder,  # ByteLevelBPEDecoder
    cfg: WhisperConfig,
    time_offset: float = 0.0,
) -> List[WordSpan]:
    """DTW + word grouping over an already-reduced alignment matrix (the
    :func:`alignment_matrix_device` output the runtime reads back instead
    of the raw cross tensor)."""

    toks = np.asarray(list(tokens), np.int64)
    if toks.size == 0:
        return []
    text_mask = toks < min(cfg.eot_id, decoder.special_base)
    if not text_mask.any():
        return []
    text_rows = np.asarray(matrix)[text_mask]
    spans = token_frame_spans(text_rows)
    return group_words(toks[text_mask].tolist(), spans, decoder,
                       time_offset=time_offset)


