"""TPU-native Whisper ASR runtime: wav -> TranscriptSegments.

The top rung of the ASR ladder (reference loads torch Whisper on the host,
``/root/reference/app/ingest/youtube.py:150-209``). Everything after the wav
read runs jitted on device: log-mel frontend, encoder, and KV-cached greedy
decode (:mod:`mmrag_tpu.models.whisper`). Audio is split into Whisper's 30 s
windows, windows are batched into power-of-two buckets so each (batch,)
shape compiles once, and one dispatch transcribes the whole batch.

Activation requires converted weights + ``vocab.json`` under
``WEIGHTS_DIR/<MODEL_ASR>/`` (``python -m mmrag_tpu.models.cli
convert-whisper ...``); otherwise :func:`get_asr_runtime` returns None and
callers fall through to the torch ladder, matching the reference's
import-gated degrade behavior.

Segment granularity matches the reference's torch path
(``app/ingest/youtube.py:178-209``): with ``MODEL_ASR_TIMESTAMPS`` (the
default) each window decodes with a timestamp-enabled prefix and is split on
Whisper timestamp tokens into sub-window segments (typically a sentence,
<5 s), so ``[ts:a-b]`` citations are fine-grained. Disabled — or when a
window's decode emits no usable stamps — segments fall back to one per 30 s
window (start = window offset, duration = audio covered).
"""

from __future__ import annotations

import dataclasses
import os
import threading
import wave
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import logging

from ..settings import Settings, settings as _default_settings

logger = logging.getLogger(__name__)

_CHUNK_BUCKETS = (1, 2, 4, 8)


def read_wav_mono16k(path: str) -> np.ndarray:
    """16 kHz mono PCM wav -> float32 waveform in [-1, 1].

    Our ffmpeg extraction step (:func:`mmrag_tpu.ingest.youtube.extract_audio`)
    always produces this format; anything else is a caller bug, reported
    loudly rather than resampled silently.
    """

    with wave.open(path, "rb") as fh:
        if fh.getframerate() != 16_000 or fh.getnchannels() != 1:
            raise ValueError(
                f"{path}: expected 16kHz mono wav, got "
                f"{fh.getframerate()}Hz x{fh.getnchannels()}"
            )
        width = fh.getsampwidth()
        raw = fh.readframes(fh.getnframes())
    if width == 2:
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        audio = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        audio = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"{path}: unsupported sample width {width}")
    return audio


def _bucket(n: int, buckets=_CHUNK_BUCKETS) -> int:
    from ..models.runtime import _bucket as _impl  # single shared definition

    return _impl(n, buckets)


class WhisperRuntime:
    """Lazy-loading, bucket-compiled Whisper transcription engine.

    ``language`` is a code from :data:`mmrag_tpu.models.whisper.LANGUAGES`
    or ``"auto"`` (default): detect once per file from the first window —
    the same behavior as the reference's torch ``model.transcribe``
    auto-detection (``/root/reference/app/ingest/youtube.py:178-209``).
    """

    def __init__(
        self,
        cfg: Optional[Settings] = None,
        max_tokens: int = 224,
        language: Optional[str] = None,
        timestamps: Optional[bool] = None,
    ) -> None:
        self.cfg = cfg or _default_settings
        self.max_tokens = max_tokens
        self.language = language or self.cfg.models.asr_language
        self.timestamps = (
            self.cfg.models.asr_timestamps if timestamps is None else timestamps
        )
        self._lock = threading.RLock()
        self._params = None
        self._model_cfg = None
        self._decoder = None
        self._fns: Dict[tuple, Callable] = {}
        self._detect_fn = None

    # -- loading ------------------------------------------------------------

    def _weights_dir(self) -> str:
        return os.path.join(
            self.cfg.paths.weights_dir, self.cfg.models.asr.replace("/", "__")
        )

    def available(self) -> bool:
        from ..models import convert

        wdir = self._weights_dir()
        return convert.params_available(wdir, "model") and os.path.exists(
            os.path.join(wdir, "vocab.json")
        )

    def _ensure(self) -> None:
        with self._lock:
            if self._params is not None:
                return
            from ..models import convert, tokenizer as tok, whisper

            wdir = self._weights_dir()
            if not self.available():
                raise FileNotFoundError(
                    f"no converted whisper weights + vocab.json under {wdir}; "
                    "run `python -m mmrag_tpu.models.cli convert-whisper <hf_dir>`"
                )
            meta_path = os.path.join(wdir, "model.json")
            meta = {}
            if os.path.exists(meta_path):
                import json

                with open(meta_path, encoding="utf-8") as fh:
                    meta = json.load(fh)
            if "config" in meta:  # written by cli convert-whisper
                self._model_cfg = whisper.WhisperConfig(**meta["config"])
            else:
                self._model_cfg = whisper.preset(self.cfg.models.asr)
            params = convert.load_params(wdir, "model")
            vocab = int(params["decoder"]["token_embedding"].shape[0])
            if vocab != self._model_cfg.vocab_size:  # .en checkpoints
                import dataclasses

                self._model_cfg = dataclasses.replace(self._model_cfg, vocab_size=vocab)
            self._params = params
            # the decode loop cannot run past the learned position table
            self.max_tokens = min(self.max_tokens, self._model_cfg.max_target_positions)
            self._decoder = tok.load_whisper_decoder(wdir, self._model_cfg.eot_id)
            logger.info("whisper ASR loaded from %s (%s)", wdir, self.cfg.models.asr)

    def _compute_dtype(self):
        import jax
        import jax.numpy as jnp

        return (
            jnp.bfloat16
            if self.cfg.tpu.compute_dtype == "bfloat16"
            and jax.default_backend() != "cpu"
            else jnp.float32
        )

    def _transcribe_fn(self, batch: int, prefix: tuple) -> Callable:
        """One jitted mel->encode->greedy-decode program per (batch bucket,
        decode prefix) — the prefix is baked in as scan constants."""

        key = (batch, prefix)
        with self._lock:
            if key in self._fns:
                return self._fns[key]
            import jax

            from ..models import whisper

            mcfg = self._model_cfg
            compute = self._compute_dtype()

            def fn(params, audio):
                mel = whisper.log_mel_spectrogram(audio, mcfg.num_mel_bins)
                enc = whisper.whisper_encode(params, mel, mcfg, compute_dtype=compute)
                return whisper.whisper_greedy_decode(
                    params, enc, mcfg, forced_prefix=prefix,
                    max_len=self.max_tokens, compute_dtype=compute,
                )

            self._fns[key] = jax.jit(fn)
            return self._fns[key]

    def _resolve_prefix(self, first_window: np.ndarray) -> tuple:
        """Decode prefix for this file: fixed language, or one detection
        dispatch on the first window when ``language == "auto"``."""

        mcfg = self._model_cfg

        def finish(prefix: tuple) -> tuple:
            # timestamp mode drops the trailing <|notimestamps|>
            return prefix[:-1] if self.timestamps else prefix

        if not mcfg.multilingual:
            return finish(mcfg.forced_prefix())
        if self.language != "auto":
            return finish(mcfg.forced_prefix(language=self.language))
        import jax
        import jax.numpy as jnp

        from ..models import whisper

        with self._lock:
            if self._detect_fn is None:
                compute = self._compute_dtype()

                def detect(params, audio):
                    mel = whisper.log_mel_spectrogram(audio, mcfg.num_mel_bins)
                    enc = whisper.whisper_encode(params, mel, mcfg, compute_dtype=compute)
                    return whisper.detect_language(params, enc, mcfg, compute)

                self._detect_fn = jax.jit(detect)
        lang_id = int(self._detect_fn(self._params, jnp.asarray(first_window[None]))[0])
        return finish((mcfg.sot_id, lang_id, mcfg.transcribe_id, mcfg.no_timestamps_id))

    # -- transcription --------------------------------------------------------

    def transcribe_array(self, audio: np.ndarray) -> List[Tuple[float, float, str]]:
        """float32 16 kHz waveform -> [(start_sec, duration_sec, text)]."""

        from ..models.whisper import HOP_LENGTH, SAMPLE_RATE

        self._ensure()
        # Whisper's window is max_source_positions encoder states x conv
        # stride 2 x hop 160 samples = 30 s for real checkpoints; deriving it
        # from the config keeps reduced test models consistent end-to-end.
        chunk_samples = self._model_cfg.max_source_positions * 2 * HOP_LENGTH
        audio = np.asarray(audio, np.float32)
        total = len(audio)
        if total == 0:
            return []
        n_chunks = max(1, -(-total // chunk_samples))

        first = np.zeros(chunk_samples, np.float32)
        first[: min(total, chunk_samples)] = audio[:chunk_samples]
        prefix = self._resolve_prefix(first)

        results: List[Tuple[float, float, str]] = []
        done = 0
        while done < n_chunks:
            take = min(n_chunks - done, _CHUNK_BUCKETS[-1])
            bsz = _bucket(take)
            # slice+pad per batch: peak host memory is one bucket of windows,
            # not a zero-padded copy of the whole file
            batch = np.zeros((bsz, chunk_samples), np.float32)
            for j in range(take):
                part = audio[(done + j) * chunk_samples : (done + j + 1) * chunk_samples]
                batch[j, : len(part)] = part
            tokens, lengths = self._transcribe_fn(bsz, prefix)(self._params, batch)
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
            for j in range(take):
                idx = done + j
                start = idx * chunk_samples / SAMPLE_RATE
                covered = min(total - idx * chunk_samples, chunk_samples) / SAMPLE_RATE
                toks = tokens[j, : int(lengths[j])]
                results.extend(self._window_segments(toks, start, covered))
            done += take
        return results

    def _window_segments(
        self, toks: np.ndarray, start: float, covered: float
    ) -> List[Tuple[float, float, str]]:
        """One window's tokens -> segments: timestamp-token split when
        enabled (falling back to the whole window if the decode produced no
        usable stamps), else one segment per window."""

        if self.timestamps:
            from ..models.whisper import parse_timestamp_segments

            parsed = parse_timestamp_segments(
                toks, self._model_cfg, time_offset=start, window_seconds=covered
            )
            out = []
            for seg_start, seg_end, ids in parsed:
                text = self._decoder.decode(ids).strip()
                if text:
                    end = min(seg_end, start + covered)
                    out.append((seg_start, max(end - seg_start, 0.0), text))
            if out:
                return out
        text = self._decoder.decode(toks).strip()
        return [(start, covered, text)] if text else []

    def transcribe_wav(self, wav_path: str):
        """wav file -> List[TranscriptSegment] (the ladder contract).

        With ``MODEL_ASR_WORD_ALIGN`` on (and the detokenizer present),
        each segment also carries word-level spans from the
        cross-attention DTW aligner — the reference's WhisperX-align
        capability surfaced through the production ingest path."""

        from .youtube import TranscriptSegment

        audio = read_wav_mono16k(wav_path)
        if self.cfg.models.asr_word_align and self._resolve_decoder():
            return [
                TranscriptSegment(
                    text=seg["text"], start=seg["start"],
                    duration=seg["duration"],
                    words=tuple(
                        (w.word, round(w.start, 3), round(w.end, 3))
                        for w in seg["words"]),
                )
                for seg in self.transcribe_array_aligned(audio)
            ]
        return [
            TranscriptSegment(text=text, start=start, duration=dur)
            for start, dur, text in self.transcribe_array(audio)
        ]

    def _resolve_decoder(self) -> bool:
        """True when the vocab.json detokenizer loaded (alignment needs
        per-token vocab strings; without it fall back to plain segments)."""

        self._ensure()
        return self._decoder is not None

    # -- word-level alignment (the WhisperX-align equivalent) ----------------

    def _aligned_transcribe_fn(self, prefix: tuple) -> Callable:
        """One jitted program per decode prefix for the aligned path:
        mel -> encode ONCE -> KV-cached greedy decode -> teacher-forced
        cross-attention capture over the same encoder states — a single
        dispatch per window (the review found the first cut encoding twice:
        once in the decode program, again in a separate capture program).
        Batch is 1: alignment is an enrichment API, not the ingest hot
        path; see :mod:`mmrag_tpu.models.align`."""

        key = ("aligned", prefix)
        with self._lock:
            if key not in self._fns:
                import jax

                from ..models import align as jalign, whisper

                mcfg = self._model_cfg
                compute = self._compute_dtype()

                def fn(params, audio):
                    mel = whisper.log_mel_spectrogram(audio, mcfg.num_mel_bins)
                    enc = whisper.whisper_encode(
                        params, mel, mcfg, compute_dtype=compute)
                    tokens, lengths = whisper.whisper_greedy_decode(
                        params, enc, mcfg, forced_prefix=prefix,
                        max_len=self.max_tokens, compute_dtype=compute)
                    _, cross = jalign.decoder_cross_attention(
                        params, tokens, enc, mcfg, compute_dtype=compute)
                    # reduce to the (s_tokens, frames) alignment matrix ON
                    # DEVICE: the raw cross tensor is ~128 MB/window at
                    # whisper-base and its readback dominated the aligned
                    # path's wall clock over the tunnel
                    matrix = jalign.alignment_matrix_device(cross[:, 0])
                    return tokens, lengths, matrix

                self._fns[key] = jax.jit(fn)
            return self._fns[key]

    def transcribe_array_aligned(self, audio: np.ndarray) -> List[Dict]:
        """Waveform -> segments WITH word-level timestamps.

        The TPU-native equivalent of the reference's WhisperX alignment
        rung (``/root/reference/app/ingest/youtube.py:156-157``): instead
        of a second wav2vec model, a teacher-forced decoder pass captures
        cross-attention on device and a host DTW recovers word spans
        (:mod:`mmrag_tpu.models.align`). Returns
        ``[{"start", "duration", "text", "words": [WordSpan, ...]}, ...]``
        — an enrichment API on top of the ladder's segment contract.
        """

        import jax.numpy as jnp

        from ..models import align as jalign
        from ..models.whisper import HOP_LENGTH, SAMPLE_RATE

        self._ensure()
        if self._decoder is None:
            raise FileNotFoundError(
                "word alignment needs the vocab.json detokenizer")
        mcfg = self._model_cfg
        chunk_samples = mcfg.max_source_positions * 2 * HOP_LENGTH
        audio = np.asarray(audio, np.float32)
        total = len(audio)
        if total == 0:
            return []
        n_chunks = max(1, -(-total // chunk_samples))
        first = np.zeros(chunk_samples, np.float32)
        first[: min(total, chunk_samples)] = audio[:chunk_samples]
        prefix = self._resolve_prefix(first)

        out: List[Dict] = []
        fn = self._aligned_transcribe_fn(prefix)
        for idx in range(n_chunks):
            window = np.zeros(chunk_samples, np.float32)
            part = audio[idx * chunk_samples: (idx + 1) * chunk_samples]
            window[: len(part)] = part
            start = idx * chunk_samples / SAMPLE_RATE
            covered = min(total - idx * chunk_samples, chunk_samples) / SAMPLE_RATE
            tokens, lengths, matrix = fn(self._params,
                                         jnp.asarray(window[None]))
            n_tok = int(np.asarray(lengths)[0])
            toks = np.asarray(tokens)[0, :n_tok]
            segs = self._window_segments(toks, start, covered)
            if not segs:
                continue
            words = jalign.words_from_matrix(
                np.asarray(matrix)[:n_tok], toks,
                self._decoder, mcfg, time_offset=start)
            # the aligner sees all 1500 encoder frames including the
            # zero-padded tail, so a word span can land past the window's
            # covered audio — clamp to [start, start + covered] the same
            # way _window_segments clamps segment ends. A word whose whole
            # span fell into the padding keeps a minimal sliver at the
            # window end (it is real decoded text; only its alignment
            # overflowed).
            hi = start + covered
            clamped = []
            for w in words:
                lo_w = min(max(w.start, start), hi)
                hi_w = min(max(w.end, start), hi)
                if hi_w <= lo_w:
                    lo_w = max(start, hi - 0.02)
                    hi_w = hi
                clamped.append(
                    dataclasses.replace(w, start=lo_w, end=hi_w))
            words = clamped
            # assign each word to the segment containing its midpoint
            # (fallback: the nearest segment start)
            segments = [
                {"start": s, "duration": d, "text": t, "words": []}
                for s, d, t in segs
            ]
            for w in words:
                mid = (w.start + w.end) / 2.0
                target = next(
                    (seg for seg in segments
                     if seg["start"] <= mid < seg["start"] + seg["duration"]),
                    min(segments, key=lambda seg: abs(seg["start"] - w.start)),
                )
                target["words"].append(w)
            out.extend(segments)
        return out

    def transcribe_wav_aligned(self, wav_path: str) -> List[Dict]:
        """wav file -> word-aligned segments (see
        :meth:`transcribe_array_aligned`)."""

        return self.transcribe_array_aligned(read_wav_mono16k(wav_path))


_runtime: Optional[WhisperRuntime] = None
_runtime_lock = threading.Lock()


def get_asr_runtime(cfg: Optional[Settings] = None) -> Optional[WhisperRuntime]:
    """Singleton WhisperRuntime, or None when no converted weights exist
    (callers fall through to the torch ladder). A call with a *different*
    Settings (weights dir / model id / language) rebuilds the singleton
    rather than silently serving the old configuration."""

    global _runtime
    with _runtime_lock:
        wanted = cfg or _default_settings
        if _runtime is not None and (
            _runtime.cfg.models.asr != wanted.models.asr
            or _runtime.cfg.paths.weights_dir != wanted.paths.weights_dir
            or _runtime.cfg.models.asr_language != wanted.models.asr_language
            or _runtime.cfg.models.asr_timestamps != wanted.models.asr_timestamps
            or _runtime.cfg.models.asr_word_align != wanted.models.asr_word_align
        ):
            _runtime = None
        if _runtime is None:
            candidate = WhisperRuntime(wanted)
            if not candidate.available():
                return None
            _runtime = candidate
        return _runtime


def reset_asr_runtime() -> None:
    global _runtime
    with _runtime_lock:
        _runtime = None
