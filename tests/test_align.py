"""Word-level alignment (models/align.py + WhisperRuntime aligned API) —
the TPU-native equivalent of the reference's WhisperX alignment rung
(/root/reference/app/ingest/youtube.py:156-157): teacher-forced
cross-attention capture on device, DTW + word grouping on the host.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.models import align as jalign
from mmrag_tpu.models import tokenizer as jtok
from mmrag_tpu.models import whisper as jwhisper

TINY = jwhisper.WhisperConfig(
    num_mel_bins=80, d_model=64, encoder_layers=2, encoder_heads=4,
    decoder_layers=2, decoder_heads=4, ffn_dim=128, vocab_size=51865,
    max_source_positions=75, max_target_positions=48,
)


@pytest.fixture(scope="module")
def tiny_params():
    return jwhisper.init_whisper_params(jax.random.PRNGKey(3), TINY)


# ---------------------------------------------------------------------------
# DTW + matrix plumbing (pure host)
# ---------------------------------------------------------------------------


def test_dtw_recovers_block_diagonal_alignment():
    """Tokens attending to consecutive frame blocks must map to exactly
    those blocks."""

    n_tok, frames_per_tok = 5, 8
    m = n_tok * frames_per_tok
    matrix = np.full((n_tok, m), -1.0)
    for i in range(n_tok):
        matrix[i, i * frames_per_tok:(i + 1) * frames_per_tok] = 1.0
    spans = jalign.token_frame_spans(matrix)
    for i in range(n_tok):
        assert spans[i, 0] == i * frames_per_tok, spans
        assert spans[i, 1] == (i + 1) * frames_per_tok, spans


def test_dtw_path_is_monotonic_on_noise():
    rng = np.random.default_rng(0)
    matrix = rng.standard_normal((12, 60))
    path = jalign.dtw_monotonic(-matrix)
    assert path[0] == (0, 0) and path[-1] == (11, 59)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}
    spans = jalign.token_frame_spans(matrix)
    assert (spans[:, 1] > spans[:, 0]).all()
    assert (np.diff(spans[:, 0]) >= 0).all()  # starts monotonic


def test_median_filter_smooths_spikes():
    x = np.zeros((2, 21))
    x[:, 10] = 100.0  # isolated spike must vanish under width-7 median
    y = jalign._median_filter(x, 7)
    assert y.shape == x.shape
    assert np.all(y == 0.0)


# ---------------------------------------------------------------------------
# Device capture: logits parity + prob structure
# ---------------------------------------------------------------------------


def test_cross_attention_capture_matches_decoder_logits(tiny_params):
    """The capture path re-implements the decoder inline; its logits must
    bit-track whisper_decode_logits so it can never drift from the
    production decoder."""

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 150, 80)), jnp.float32)
    enc = jwhisper.whisper_encode(tiny_params, mel, TINY)
    ids = jnp.asarray(rng.integers(0, 200, (2, 9)), jnp.int32)
    want = np.asarray(jwhisper.whisper_decode_logits(tiny_params, ids, enc, TINY))
    got, cross = jalign.decoder_cross_attention(tiny_params, ids, enc, TINY)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    cross = np.asarray(cross)
    assert cross.shape == (TINY.decoder_layers, 2, TINY.decoder_heads, 9,
                           enc.shape[1])
    np.testing.assert_allclose(cross.sum(-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Word grouping via the byte-level vocab
# ---------------------------------------------------------------------------


def _make_decoder(words):
    """Vocab where each word maps to 1-2 byte-level pieces; returns
    (decoder, token_ids) for the concatenated ' word' stream."""

    b2u = jtok._bytes_to_unicode()

    def sym(s: str) -> str:
        return "".join(b2u[b] for b in s.encode())

    vocab, ids = {}, []
    nid = 0
    for w in words:
        pieces = ([f" {w}"] if len(w) < 4
                  else [f" {w[:2]}", w[2:]])  # split long words in two
        for p in pieces:
            key = sym(p)
            if key not in vocab:
                vocab[key] = nid
                nid += 1
            ids.append(vocab[key])
    vocab["<|endoftext|>"] = 50256
    return jtok.ByteLevelBPEDecoder(vocab, special_base=50256), ids


def test_group_words_splits_on_byte_level_space():
    words = ["the", "powerhouse", "of", "the", "cell"]
    decoder, ids = _make_decoder(words)
    spans = np.array([[i * 4, (i + 1) * 4] for i in range(len(ids))])
    got = jalign.group_words(ids, spans, decoder, time_offset=10.0)
    assert [w.word for w in got] == words
    # multi-piece words span their pieces' union; all offsets applied
    assert got[0].start == 10.0
    for w in got:
        assert w.end > w.start >= 10.0
    # the two-piece word covers both pieces' frames
    ph = got[1]
    assert (ph.end - ph.start) == pytest.approx(
        2 * 4 * jalign.FRAME_SECONDS)


def test_words_from_cross_skips_special_tokens(tiny_params):
    """Prefix/EOT tokens must not surface as words; text rows align."""

    decoder, ids = _make_decoder(["hello", "world"])
    toks = [TINY.sot_id] + ids + [TINY.eot_id]
    L, H, F = TINY.decoder_layers, TINY.decoder_heads, 40
    rng = np.random.default_rng(2)
    cross = rng.random((L, H, len(toks), F))
    words = jalign.words_from_cross(cross, toks, decoder, TINY)
    assert [w.word for w in words] == ["hello", "world"]


# ---------------------------------------------------------------------------
# Runtime end-to-end: wav -> word-aligned segments
# ---------------------------------------------------------------------------


def test_runtime_transcribe_aligned_end_to_end(tmp_path):
    import wave

    from mmrag_tpu import settings as settings_mod
    from mmrag_tpu.ingest import asr
    from mmrag_tpu.models import convert

    params = jwhisper.init_whisper_params(jax.random.PRNGKey(9), TINY)
    model_id = "openai/whisper-aligntest"
    wdir = tmp_path / "weights" / model_id.replace("/", "__")
    convert.save_params(
        params, str(wdir), "model",
        meta={"arch": "whisper", "config": dataclasses.asdict(TINY)})
    b2u = jtok._bytes_to_unicode()
    vocab = {"".join(b2u[b] for b in f" tok{i}".encode()): i
             for i in range(TINY.vocab_size)}
    (wdir / "vocab.json").write_text(json.dumps(vocab))

    sr = 16000
    t = np.arange(int(sr * 2.5)) / sr
    pcm = (np.sin(2 * np.pi * 330 * t) * 0.3 * 32767).astype(np.int16)
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(sr)
        fh.writeframes(pcm.tobytes())

    cfg = settings_mod.load_settings({
        "WEIGHTS_DIR": str(tmp_path / "weights"), "MODEL_ASR": model_id})
    runtime = asr.WhisperRuntime(cfg, max_tokens=8)
    assert runtime.available()
    segments = runtime.transcribe_wav_aligned(str(wav))
    window = TINY.max_source_positions * 2 * 160 / 16000
    plain = runtime.transcribe_wav(str(wav))
    # aligned segments mirror the plain ladder segments (same decode path)
    assert len(segments) == len(plain)
    for seg in segments:
        assert seg["text"]
        assert 0.0 <= seg["start"] <= 2.5 + window
        for w in seg["words"]:
            assert isinstance(w, jalign.WordSpan)
            assert w.end > w.start >= 0.0
            # a word's frames stay inside its window (offset applied)
            assert w.start >= seg["start"] - window
            # and never past the window's COVERED audio (the encoder's
            # zero-padded tail is clamped away — advisor r4): this wav is
            # 2.5 s inside a longer window, so the bound is the audio end
            assert w.end <= 2.5 + 1e-6
        # every word's text appears in the window text stream
        joined = " ".join(w.word for w in seg["words"])
        for piece in joined.split()[:3]:
            assert piece.startswith("tok")


def test_word_align_knob_flows_through_ladder(tmp_path):
    """MODEL_ASR_WORD_ALIGN=1: transcribe_wav returns TranscriptSegments
    carrying word spans, and segments_to_nodes surfaces them in node
    metadata — the WhisperX-align capability wired through the production
    ingest path, not just the enrichment API."""

    import wave

    from mmrag_tpu import settings as settings_mod
    from mmrag_tpu.ingest import asr, youtube as yt
    from mmrag_tpu.models import convert

    params = jwhisper.init_whisper_params(jax.random.PRNGKey(9), TINY)
    model_id = "openai/whisper-aligntest"
    wdir = tmp_path / "weights" / model_id.replace("/", "__")
    convert.save_params(
        params, str(wdir), "model",
        meta={"arch": "whisper", "config": dataclasses.asdict(TINY)})
    b2u = jtok._bytes_to_unicode()
    vocab = {"".join(b2u[b] for b in f" tok{i}".encode()): i
             for i in range(TINY.vocab_size)}
    (wdir / "vocab.json").write_text(json.dumps(vocab))

    sr = 16000
    t = np.arange(int(sr * 2.0)) / sr
    pcm = (np.sin(2 * np.pi * 220 * t) * 0.3 * 32767).astype(np.int16)
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(sr)
        fh.writeframes(pcm.tobytes())

    cfg = settings_mod.load_settings({
        "WEIGHTS_DIR": str(tmp_path / "weights"), "MODEL_ASR": model_id,
        "MODEL_ASR_WORD_ALIGN": "1"})
    runtime = asr.WhisperRuntime(cfg, max_tokens=8)
    segments = runtime.transcribe_wav(str(wav))
    assert segments and all(isinstance(s, yt.TranscriptSegment)
                            for s in segments)
    segs_with_words = [s for s in segments if s.words]
    assert segs_with_words, "aligned rung must attach word spans"
    for s in segs_with_words:
        for word, start, end in s.words:
            assert word and end > start >= 0.0

    nodes = yt.segments_to_nodes("vid1", segments)
    assert any("words" in n["metadata"] for n in nodes)
    wmeta = next(n["metadata"]["words"] for n in nodes
                 if "words" in n["metadata"])
    assert wmeta[0][0].startswith("tok")

    # knob off (default): plain segments, no metadata key
    cfg_off = settings_mod.load_settings({
        "WEIGHTS_DIR": str(tmp_path / "weights"), "MODEL_ASR": model_id})
    plain = asr.WhisperRuntime(cfg_off, max_tokens=8).transcribe_wav(str(wav))
    assert all(s.words is None for s in plain)
    assert all("words" not in n["metadata"]
               for n in yt.segments_to_nodes("vid2", plain))


def test_alignment_matrix_device_matches_host():
    """The in-jit reduction (z-norm + median-7 + head mean on device, so
    only the (s, f) matrix crosses the tunnel) must match the host
    attention_alignment_matrix numerically, and produce identical words."""

    rng = np.random.default_rng(11)
    cross = rng.random((4, 8, 24, 96)).astype(np.float32)
    host = jalign.attention_alignment_matrix(cross)
    dev = np.asarray(jax.jit(jalign.alignment_matrix_device)(
        jnp.asarray(cross)))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host.astype(np.float32), atol=2e-4)

    decoder, ids = _make_decoder(["alpha", "beta", "gamma"])
    toks = [TINY.sot_id] + ids + [TINY.eot_id]
    cross_t = rng.random(
        (TINY.decoder_layers, TINY.decoder_heads, len(toks), 60)
    ).astype(np.float32)
    via_cross = jalign.words_from_cross(cross_t, toks, decoder, TINY)
    via_matrix = jalign.words_from_matrix(
        np.asarray(jax.jit(jalign.alignment_matrix_device)(
            jnp.asarray(cross_t))),
        toks, decoder, TINY)
    assert [w.word for w in via_matrix] == [w.word for w in via_cross]
    for a, b in zip(via_matrix, via_cross):
        assert abs(a.start - b.start) < 1e-6 and abs(a.end - b.end) < 1e-6
