"""Pure-JAX Whisper (encoder-decoder ASR), HF-numerics-exact.

TPU-native replacement for the reference's torch Whisper/WhisperX ASR
fallback (``/root/reference/app/ingest/youtube.py:150-209``). The reference
loads ``whisper.load_model("small")`` on CPU/CUDA; here the whole pipeline —
log-mel frontend, encoder, and the autoregressive greedy decode — is
functional JAX compiled by XLA for TPU:

  * the log-mel spectrogram runs on device as framing + DFT-as-matmul (two
    (frames, 400) x (400, 201) matmuls ride the MXU; no FFT op needed at
    this size) + mel filterbank matmul, numerically matching HF's
    ``WhisperFeatureExtractor`` (validated in tests/test_whisper.py);
  * the encoder expresses both stem convolutions as unfold+matmul so they
    map onto the MXU, with static (batch, 1500, d) shapes;
  * the greedy decoder is a ``lax.scan`` over a static ``max_len`` with
    preallocated self-attention KV caches and precomputed cross-attention
    K/V — one compiled program per (batch, max_len) bucket, no Python in
    the token loop.

Architecture facts mirrored from HF ``openai/whisper-*``: pre-LN blocks,
erf gelu, LayerNorm eps 1e-5, no bias on k_proj, q scaled by head_dim**-0.5,
sinusoidal (stored) encoder positions, learned decoder positions, logits =
tied token-embedding transpose. Decoding forces the reference-equivalent
``<|startoftranscript|>[lang][task]<|notimestamps|>`` prefix and stops at
``<|endoftext|>`` (token suppression lists are a non-goal for v1 — the
reference's segments feed a text index, not verbatim captions).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bert import _precision  # shared bf16->DEFAULT / f32->HIGHEST policy

Params = Dict[str, Any]

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SECONDS = 30
CHUNK_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS  # 480_000
NUM_FRAMES = CHUNK_SAMPLES // HOP_LENGTH  # 3000 mel frames per 30 s chunk


@dataclass(frozen=True)
class WhisperConfig:
    num_mel_bins: int = 80
    d_model: int = 512
    encoder_layers: int = 6
    encoder_heads: int = 8
    decoder_layers: int = 6
    decoder_heads: int = 8
    ffn_dim: int = 2048
    vocab_size: int = 51_865
    max_source_positions: int = 1500
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_heads

    # ---- special token ids -------------------------------------------------
    # OpenAI's vocab layout: ``base`` text tokens (ids 0..base-1), then
    # <|endoftext|>, <|startoftranscript|>, L language tokens, <|translate|>,
    # <|transcribe|>, <|startoflm|>, <|startofprev|>, <|nospeech|>,
    # <|notimestamps|>, and 1501 timestamp tokens — so
    # ``vocab = base + L + 1509``. Multilingual models: base 50257, L=99
    # (vocab 51865); large-v3 adds one language (51866); .en models: base
    # 50256, same specials (51864). Deriving ids structurally covers all of
    # them with one formula. Reduced-vocab test models (vocab < 51864) use
    # the last three ids as eot/sot/notimestamps so the decode loop and
    # detokenizer stay well-defined.
    @property
    def _standard_vocab(self) -> bool:
        return self.vocab_size >= 51_864

    @property
    def multilingual(self) -> bool:
        return self.vocab_size >= 51_865

    @property
    def eot_id(self) -> int:  # == number of base text tokens
        if not self._standard_vocab:
            return self.vocab_size - 1
        return 50_257 if self.multilingual else 50_256

    @property
    def sot_id(self) -> int:
        return self.eot_id + 1 if self._standard_vocab else self.vocab_size - 2

    @property
    def num_languages(self) -> int:
        return self.vocab_size - self.eot_id - 1509 if self._standard_vocab else 0

    @property
    def lang_base_id(self) -> int:  # <|en|> is the first language token
        return self.sot_id + 1

    @property
    def translate_id(self) -> int:
        return self.lang_base_id + self.num_languages

    @property
    def transcribe_id(self) -> int:
        return self.translate_id + 1

    @property
    def no_timestamps_id(self) -> int:
        return self.transcribe_id + 4 if self._standard_vocab else self.vocab_size - 3

    @property
    def timestamp_begin_id(self) -> int:
        return self.no_timestamps_id + 1

    def language_id(self, code: str) -> int:
        """Token id for a language code (OpenAI's canonical ordering)."""

        idx = LANGUAGES.index(code)  # raises ValueError for unknown codes
        if idx >= self.num_languages:
            raise ValueError(f"language {code!r} not in this model's vocab")
        return self.lang_base_id + idx

    def forced_prefix(self, language: str = "en", task: str = "transcribe") -> Tuple[int, ...]:
        """``<|startoftranscript|>[<|lang|><|task|>]<|notimestamps|>``."""

        if not self.multilingual:
            return (self.sot_id, self.no_timestamps_id)
        task_id = self.transcribe_id if task == "transcribe" else self.translate_id
        return (self.sot_id, self.language_id(language), task_id, self.no_timestamps_id)


# OpenAI Whisper's language ordering — token id = lang_base_id + index.
# The 100th (yue) exists only in large-v3's vocab (num_languages gates it).
LANGUAGES: Tuple[str, ...] = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
)


WHISPER_TINY = WhisperConfig(d_model=384, encoder_layers=4, encoder_heads=6,
                             decoder_layers=4, decoder_heads=6, ffn_dim=1536)
WHISPER_BASE = WhisperConfig()
WHISPER_SMALL = WhisperConfig(d_model=768, encoder_layers=12, encoder_heads=12,
                              decoder_layers=12, decoder_heads=12, ffn_dim=3072)

_PRESETS = {"tiny": WHISPER_TINY, "base": WHISPER_BASE, "small": WHISPER_SMALL}


def preset(name: str) -> WhisperConfig:
    for key, cfg in _PRESETS.items():
        if key in name:
            return cfg
    raise KeyError(f"unknown whisper preset in {name!r}; expected one of {list(_PRESETS)}")


# ---------------------------------------------------------------------------
# Log-mel frontend (HF WhisperFeatureExtractor numerics)
# ---------------------------------------------------------------------------


def mel_filterbank(
    n_freqs: int = N_FFT // 2 + 1,
    n_mels: int = 80,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank
    ``(n_freqs, n_mels)`` — matches HF ``mel_filter_bank(..., norm="slaney",
    mel_scale="slaney")`` / librosa defaults."""

    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        hz = 200.0 * m / 3.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freqs)
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.T.astype(np.float32)  # (n_freqs, n_mels)


@functools.lru_cache(maxsize=4)
def _mel_constants(n_mels: int):
    n = np.arange(N_FFT)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / N_FFT)).astype(np.float64)  # periodic hann
    k = np.arange(N_FFT // 2 + 1)
    ang = -2 * np.pi * np.outer(n, k) / N_FFT
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)  # window folded into DFT
    sin_b = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b, mel_filterbank(n_mels=n_mels)


def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """(b, 480000) f32 waveform -> (b, 3000, n_mels) HF-Whisper log-mel.

    Reflect-pad + frame + windowed real DFT as two MXU matmuls + mel matmul
    + log10 dynamic-range compression, all jit-compatible. Matches
    ``WhisperFeatureExtractor`` to float tolerance (tests/test_whisper.py).
    """

    cos_b, sin_b, fb = _mel_constants(n_mels)
    pad = N_FFT // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    n_frames = audio.shape[1] // HOP_LENGTH  # HF computes then drops the last frame
    idx = np.arange(n_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = x[:, idx]  # (b, frames, 400)
    real = jnp.dot(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    imag = jnp.dot(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    power = real * real + imag * imag  # (b, frames, 201)
    mel = jnp.dot(power, fb, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(mel, 1e-10, None))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# Init (seeded, offline-friendly; HF tree shape via models.convert)
# ---------------------------------------------------------------------------


def _dense_init(key, fan_in: int, fan_out: int, bias: bool = True) -> Params:
    p = {"kernel": jax.random.normal(key, (fan_in, fan_out), jnp.float32) * 0.02}
    if bias:
        p["bias"] = jnp.zeros((fan_out,), jnp.float32)
    return p


def _ln_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _attn_init(keys, d: int) -> Params:
    return {
        "q": _dense_init(keys[0], d, d),
        "k": _dense_init(keys[1], d, d, bias=False),  # whisper k_proj has no bias
        "v": _dense_init(keys[2], d, d),
        "out": _dense_init(keys[3], d, d),
    }


def _sinusoid_positions(length: int, dim: int) -> np.ndarray:
    """OpenAI Whisper's encoder sinusoids (what HF stores in
    ``encoder.embed_positions.weight``)."""

    log_timescale = np.log(10_000) / (dim // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_whisper_params(rng: jax.Array, cfg: WhisperConfig = WHISPER_BASE) -> Params:
    d, f = cfg.d_model, cfg.ffn_dim
    n_keys = 4 + cfg.encoder_layers * 6 + cfg.decoder_layers * 10
    keys = iter(jax.random.split(rng, n_keys))
    enc_layers = []
    for _ in range(cfg.encoder_layers):
        ks = [next(keys) for _ in range(6)]
        enc_layers.append({
            "ln1": _ln_init(d), "attn": _attn_init(ks[:4], d),
            "ln2": _ln_init(d),
            "fc1": _dense_init(ks[4], d, f), "fc2": _dense_init(ks[5], f, d),
        })
    dec_layers = []
    for _ in range(cfg.decoder_layers):
        ks = [next(keys) for _ in range(10)]
        dec_layers.append({
            "ln1": _ln_init(d), "self_attn": _attn_init(ks[:4], d),
            "ln_cross": _ln_init(d), "cross_attn": _attn_init(ks[4:8], d),
            "ln2": _ln_init(d),
            "fc1": _dense_init(ks[8], d, f), "fc2": _dense_init(ks[9], f, d),
        })
    return {
        "encoder": {
            "conv1": _dense_init(next(keys), 3 * cfg.num_mel_bins, d),
            "conv2": _dense_init(next(keys), 3 * d, d),
            "positions": jnp.asarray(_sinusoid_positions(cfg.max_source_positions, d)),
            "layers": enc_layers,
            "final_ln": _ln_init(d),
        },
        "decoder": {
            "token_embedding": jax.random.normal(
                next(keys), (cfg.vocab_size, d), jnp.float32) * 0.02,
            "positions": jax.random.normal(
                next(keys), (cfg.max_target_positions, d), jnp.float32) * 0.02,
            "layers": dec_layers,
            "final_ln": _ln_init(d),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dense(p: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    y = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                preferred_element_type=jnp.float32, precision=_precision(dtype))
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)  # HF whisper uses erf gelu


def _mha(attn: Params, x_q: jnp.ndarray, x_kv: jnp.ndarray, heads: int,
         bias: jnp.ndarray | None, dtype) -> jnp.ndarray:
    """(b, sq, d) x (b, sk, d) -> (b, sq, d); q pre-scaled like HF whisper."""

    b, sq, d = x_q.shape
    sk = x_kv.shape[1]
    hd = d // heads
    q = _dense(attn["q"], x_q, dtype).reshape(b, sq, heads, hd) * (hd ** -0.5)
    k = _dense(attn["k"], x_kv, dtype).reshape(b, sk, heads, hd)
    v = _dense(attn["v"], x_kv, dtype).reshape(b, sk, heads, hd)
    scores = jnp.einsum("bqnd,bknd->bnqk", q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32, precision=_precision(dtype))
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32, precision=_precision(dtype))
    return _dense(attn["out"], ctx.reshape(b, sq, d), dtype)


def _unfold3(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """kernel-3, pad-1 conv1d unfold: (b, T, c) -> (b, T_out, 3c), (k, c)
    flattening order matching torch ``Conv1d.weight`` (out, in, k) transposed
    to (k, in, out) in :func:`mmrag_tpu.models.convert.convert_whisper`."""

    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    t_out = (t + 2 - 3) // stride + 1
    idx = np.arange(t_out)[:, None] * stride + np.arange(3)[None, :]
    return xp[:, idx].reshape(b, t_out, 3 * c)


def whisper_encode(
    params: Params,
    mel: jnp.ndarray,  # (b, 3000, n_mels) from log_mel_spectrogram
    cfg: WhisperConfig = WHISPER_BASE,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Encoder states (b, 1500, d_model) in f32."""

    enc = params["encoder"]
    x = _gelu(_dense(enc["conv1"], _unfold3(mel, stride=1), compute_dtype))
    x = _gelu(_dense(enc["conv2"], _unfold3(x.astype(compute_dtype), stride=2),
                     compute_dtype))
    x = x + enc["positions"][None, : x.shape[1]]
    for layer in enc["layers"]:
        h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
        x = x + _mha(layer["attn"], h, h, cfg.encoder_heads, None, compute_dtype)
        h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
        x = x + _dense(layer["fc2"], _gelu(_dense(layer["fc1"], h, compute_dtype)),
                       compute_dtype)
    return _layer_norm(enc["final_ln"], x, cfg.layer_norm_eps)


def whisper_decode_logits(
    params: Params,
    token_ids: jnp.ndarray,  # (b, s) int32
    enc_states: jnp.ndarray,  # (b, 1500, d)
    cfg: WhisperConfig = WHISPER_BASE,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Teacher-forced decoder logits (b, s, vocab) — the parity/test path;
    generation uses the KV-cached :func:`whisper_greedy_decode`."""

    dec = params["decoder"]
    b, s = token_ids.shape
    x = dec["token_embedding"][token_ids] + dec["positions"][None, :s]
    causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
    for layer in dec["layers"]:
        h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
        x = x + _mha(layer["self_attn"], h, h, cfg.decoder_heads, causal, compute_dtype)
        h = _layer_norm(layer["ln_cross"], x, cfg.layer_norm_eps)
        x = x + _mha(layer["cross_attn"], h, enc_states, cfg.decoder_heads, None,
                     compute_dtype)
        h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
        x = x + _dense(layer["fc2"], _gelu(_dense(layer["fc1"], h, compute_dtype)),
                       compute_dtype)
    x = _layer_norm(dec["final_ln"], x, cfg.layer_norm_eps)
    return jnp.dot(x, params["decoder"]["token_embedding"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32,
                   precision=_precision(compute_dtype))


def parse_timestamp_segments(
    tokens: Sequence[int],
    cfg: WhisperConfig,
    time_offset: float = 0.0,
    window_seconds: float = float(CHUNK_SECONDS),
) -> list:
    """Split a decoded token sequence on Whisper timestamp tokens.

    Input is one window's consumed-token sequence (prefix included) decoded
    with a timestamp-enabled prefix (no ``<|notimestamps|>``). Timestamp
    tokens encode ``(id - timestamp_begin) * 0.02`` seconds. Returns
    ``[(start_sec, end_sec, [text_token_ids])]`` with ``time_offset`` added;
    parsing is tolerant of the malformed patterns unconstrained greedy can
    emit (missing closing stamp -> segment ends at the last seen time;
    consecutive stamps -> no empty segment). An empty result means the
    window produced no usable timestamps; callers fall back to
    window-granularity segments.
    """

    ts_begin, eot = cfg.timestamp_begin_id, cfg.eot_id
    segments = []
    start: float | None = None
    text: list = []
    for tok in tokens:
        tok = int(tok)
        if tok == eot:
            break
        if tok >= ts_begin:
            t = (tok - ts_begin) * 0.02
            if start is not None and text:
                segments.append((time_offset + start, time_offset + t, text))
            start, text = t, []
        elif tok < eot and start is not None:  # text token inside a segment
            text.append(tok)
    if start is not None and text:  # unterminated tail: close at window end
        segments.append((time_offset + start, time_offset + max(start, window_seconds), text))
    return segments


def detect_language(
    params: Params,
    enc_states: jnp.ndarray,  # (b, 1500, d)
    cfg: WhisperConfig = WHISPER_BASE,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Language-token ids (b,) — one decoder step on ``<|startoftranscript|>``
    with the logits restricted to the language-token slice (what the
    reference's torch ``model.transcribe`` does internally before choosing a
    decode prefix)."""

    if not cfg.multilingual:
        raise ValueError("language detection needs a multilingual checkpoint")
    b = enc_states.shape[0]
    sot = jnp.full((b, 1), cfg.sot_id, jnp.int32)
    logits = whisper_decode_logits(params, sot, enc_states, cfg, compute_dtype)
    lang_slice = jax.lax.dynamic_slice_in_dim(
        logits[:, 0], cfg.lang_base_id, cfg.num_languages, axis=-1
    )
    return (jnp.argmax(lang_slice, axis=-1) + cfg.lang_base_id).astype(jnp.int32)


# ---------------------------------------------------------------------------
# KV-cached greedy decode (lax.scan, static shapes)
# ---------------------------------------------------------------------------


def whisper_greedy_decode(
    params: Params,
    enc_states: jnp.ndarray,  # (b, 1500, d)
    cfg: WhisperConfig = WHISPER_BASE,
    forced_prefix: Sequence[int] | None = None,
    max_len: int = 224,
    compute_dtype=jnp.float32,
    eot_id: int | None = None,  # override for reduced-vocab test models
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode with per-layer KV caches.

    Returns ``(tokens, lengths)``: tokens (b, max_len) int32 — the consumed
    sequence starting at ``<|startoftranscript|>``, padded with
    ``<|endoftext|>`` after stopping — and lengths (b,) counting tokens
    before the first eot. Cross-attention K/V are computed once; each scan
    step does (b, 1, d) matmuls against the static caches, so the compiled
    loop never re-touches the encoder states.
    """

    dec = params["decoder"]
    b = enc_states.shape[0]
    d, heads = cfg.d_model, cfg.decoder_heads
    hd = d // heads
    eot = cfg.eot_id if eot_id is None else eot_id
    prefix = tuple(forced_prefix) if forced_prefix is not None else cfg.forced_prefix()
    assert 0 < len(prefix) <= max_len
    # past the position table dynamic_slice clamps silently -> degraded decode
    assert max_len <= cfg.max_target_positions, (
        f"max_len {max_len} exceeds max_target_positions {cfg.max_target_positions}"
    )

    forced_ids = np.full((max_len,), -1, np.int32)
    forced_ids[: len(prefix)] = prefix
    forced_ids = jnp.asarray(forced_ids)
    is_forced = forced_ids >= 0

    # Precompute cross K/V: list of (b, 1500, heads, hd)
    cross_kv = []
    for layer in dec["layers"]:
        ck = _dense(layer["cross_attn"]["k"], enc_states, compute_dtype)
        cv = _dense(layer["cross_attn"]["v"], enc_states, compute_dtype)
        s_enc = enc_states.shape[1]
        cross_kv.append((ck.reshape(b, s_enc, heads, hd).astype(compute_dtype),
                         cv.reshape(b, s_enc, heads, hd).astype(compute_dtype)))

    cache0 = [
        (jnp.zeros((b, max_len, heads, hd), compute_dtype),
         jnp.zeros((b, max_len, heads, hd), compute_dtype))
        for _ in dec["layers"]
    ]
    pos_mask0 = jnp.full((max_len,), -1e9, jnp.float32)  # additive; opened as we go

    def step(carry, xt):
        tok_prev, t, caches, pos_mask, done = carry
        forced_tok, forced_now = xt
        tok = jnp.where(forced_now, forced_tok, tok_prev)
        x = dec["token_embedding"][tok][:, None, :] + jax.lax.dynamic_slice_in_dim(
            dec["positions"], t, 1, axis=0)[None]
        pos_mask = pos_mask.at[t].set(0.0)  # position t is now attendable
        new_caches = []
        for layer, (kc, vc), (ck, cv) in zip(dec["layers"], caches, cross_kv):
            h = _layer_norm(layer["ln1"], x, cfg.layer_norm_eps)
            q = _dense(layer["self_attn"]["q"], h, compute_dtype).reshape(b, heads, hd) * (hd ** -0.5)
            k_t = _dense(layer["self_attn"]["k"], h, compute_dtype).reshape(b, heads, hd)
            v_t = _dense(layer["self_attn"]["v"], h, compute_dtype).reshape(b, heads, hd)
            kc = jax.lax.dynamic_update_slice_in_dim(
                kc, k_t[:, None].astype(compute_dtype), t, axis=1)
            vc = jax.lax.dynamic_update_slice_in_dim(
                vc, v_t[:, None].astype(compute_dtype), t, axis=1)
            scores = jnp.einsum("bnd,bknd->bnk", q.astype(compute_dtype), kc,
                                preferred_element_type=jnp.float32,
                                precision=_precision(compute_dtype))
            probs = jax.nn.softmax(scores + pos_mask[None, None, :], axis=-1)
            ctx = jnp.einsum("bnk,bknd->bnd", probs.astype(compute_dtype), vc,
                             preferred_element_type=jnp.float32,
                             precision=_precision(compute_dtype))
            x = x + _dense(layer["self_attn"]["out"], ctx.reshape(b, 1, d), compute_dtype)
            new_caches.append((kc, vc))

            h = _layer_norm(layer["ln_cross"], x, cfg.layer_norm_eps)
            q = _dense(layer["cross_attn"]["q"], h, compute_dtype).reshape(b, heads, hd) * (hd ** -0.5)
            scores = jnp.einsum("bnd,bknd->bnk", q.astype(compute_dtype), ck,
                                preferred_element_type=jnp.float32,
                                precision=_precision(compute_dtype))
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bnk,bknd->bnd", probs.astype(compute_dtype), cv,
                             preferred_element_type=jnp.float32,
                             precision=_precision(compute_dtype))
            x = x + _dense(layer["cross_attn"]["out"], ctx.reshape(b, 1, d), compute_dtype)

            h = _layer_norm(layer["ln2"], x, cfg.layer_norm_eps)
            x = x + _dense(layer["fc2"], _gelu(_dense(layer["fc1"], h, compute_dtype)),
                           compute_dtype)
        x = _layer_norm(dec["final_ln"], x, cfg.layer_norm_eps)[:, 0]
        logits = jnp.dot(x, dec["token_embedding"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32,
                         precision=_precision(compute_dtype))
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = done | (tok == eot)
        nxt = jnp.where(done, eot, nxt)
        emit = jnp.where(done, eot, tok)
        return (nxt, t + 1, new_caches, pos_mask, done), emit

    carry0 = (jnp.full((b,), prefix[0], jnp.int32), jnp.asarray(0, jnp.int32),
              cache0, pos_mask0, jnp.zeros((b,), bool))
    _, tokens = jax.lax.scan(step, carry0, (forced_ids, is_forced), length=max_len)
    tokens = tokens.T  # (b, max_len)
    lengths = jnp.sum((tokens != eot).astype(jnp.int32), axis=1)
    return tokens, lengths
