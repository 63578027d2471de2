"""Real-weights validation protocol (VERDICT r2 item 5).

Zero-egress fixture strategy: TINY random-init HF checkpoints are written
with ``save_pretrained`` to tmp_path — REAL checkpoint files in the real
format, driven through the identical ``from_pretrained -> derive config ->
convert -> battery`` pipeline an operator's pretrained files take (the only
thing this cannot attest is the numerical content of the actual pretrained
weights, which requires network egress; the protocol itself is fully
exercised, and the architecture is derived from the checkpoint, so even the
non-preset geometry path runs).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mmrag_tpu.models import cli as models_cli  # noqa: E402
from mmrag_tpu.models import validate as val  # noqa: E402


@pytest.fixture(scope="module")
def tiny_checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("hf_ckpts")
    torch.manual_seed(0)
    bert_cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    transformers.BertModel(bert_cfg).eval().save_pretrained(root / "minilm")
    rr_cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, num_labels=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    transformers.BertForSequenceClassification(rr_cfg).eval().save_pretrained(
        root / "reranker"
    )
    clip_cfg = transformers.CLIPConfig(
        text_config_dict=dict(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=16,
            # mirror the real CLIP vocab layout: BOT/EOT are the two
            # largest ids (the pooling contract clip_text_features relies on)
            bos_token_id=126, eos_token_id=127,
        ),
        vision_config_dict=dict(
            image_size=32, patch_size=16, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64,
        ),
        projection_dim=32,
    )
    transformers.CLIPModel(clip_cfg).eval().save_pretrained(root / "clip")
    wh_cfg = transformers.WhisperConfig(
        vocab_size=256, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=64, max_target_positions=32,
        dropout=0.0, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=[], begin_suppress_tokens=[],
    )
    transformers.WhisperForConditionalGeneration(wh_cfg).eval().save_pretrained(
        root / "whisper"
    )
    return root


def test_validate_minilm_battery(tiny_checkpoints):
    rep = val.validate_minilm(str(tiny_checkpoints / "minilm"), pq_corpus=512)
    assert rep["parity_ok"], rep["cosine_drift_vs_torch"]
    assert rep["cosine_drift_vs_torch"] <= val.COSINE_GATE
    assert 0.0 <= rep["w8a8_cosine_vs_f32"] <= 1.0
    assert 0.0 <= rep["pq_refined_recall_at_10"] <= 1.0
    # derived-from-checkpoint architecture, not a preset
    assert rep["config"]["hidden_size"] == 32


def test_validate_reranker_battery(tiny_checkpoints):
    rep = val.validate_reranker(str(tiny_checkpoints / "reranker"))
    assert rep["parity_ok"], rep
    assert rep["order_preserved_vs_torch"]


def test_validate_clip_battery(tiny_checkpoints):
    rep = val.validate_clip(str(tiny_checkpoints / "clip"))
    assert rep["parity_ok"], rep
    assert rep["config"]["vision"]["image_size"] == 32


def test_validate_whisper_battery(tiny_checkpoints):
    rep = val.validate_whisper(str(tiny_checkpoints / "whisper"))
    assert rep["parity_ok"], rep
    assert rep["decoder_token_agreement"] == 1.0


def test_validate_cli_end_to_end(tiny_checkpoints, tmp_path, capsys):
    out_root = tmp_path / "weights"
    models_cli.main([
        "validate",
        "--minilm", str(tiny_checkpoints / "minilm"),
        "--reranker", str(tiny_checkpoints / "reranker"),
        "--out", str(out_root),
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["passed"] is True
    assert {r["family"] for r in report["reports"]} == {"minilm", "reranker"}
    # passing weights persisted in the runtime's expected layout
    assert (out_root / "sentence-transformers__all-MiniLM-L6-v2"
            / "model.npz").exists()
    assert (out_root / "cross-encoder__ms-marco-MiniLM-L-6-v2"
            / "model.npz").exists()


def test_validate_cli_failure_exits_nonzero(tiny_checkpoints, tmp_path,
                                            monkeypatch, capsys):
    """A failing gate must exit non-zero and NOT persist weights."""

    def broken(source, **kw):
        rep = val.validate_minilm(source, pq_corpus=256)
        rep["parity_ok"] = False  # simulate a drifted checkpoint
        return rep

    monkeypatch.setitem(val.VALIDATORS, "minilm", broken)
    out_root = tmp_path / "weights"
    with pytest.raises(SystemExit) as exc:
        models_cli.main([
            "validate", "--minilm", str(tiny_checkpoints / "minilm"),
            "--out", str(out_root),
        ])
    assert exc.value.code == 1
    assert not (out_root / "sentence-transformers__all-MiniLM-L6-v2").exists()


def test_convert_found_into_upgrades_asr_runtime(tmp_path, monkeypatch):
    """The whisper hole in the probe's upgrade path (VERDICT r4 missing #1):
    a provisioned real-format whisper checkpoint is discovered by
    ``find_real_checkpoints``, converted by ``convert_found_into`` into the
    layout :mod:`mmrag_tpu.ingest.asr` loads, and the production runtime
    then transcribes AND word-aligns with it end-to-end (the reference's
    ASR ladder, ``app/ingest/youtube.py:150-166``)."""

    import wave

    from mmrag_tpu import settings as settings_mod
    from mmrag_tpu.ingest import asr
    from mmrag_tpu.models import tokenizer as jtok
    from mmrag_tpu.models.probe import convert_found_into, find_real_checkpoints

    torch.manual_seed(7)
    wh_cfg = transformers.WhisperConfig(
        vocab_size=256, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=64, max_target_positions=32,
        dropout=0.0, attention_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    src = tmp_path / "real" / "whisper-base"
    transformers.WhisperForConditionalGeneration(wh_cfg).eval().save_pretrained(
        src)
    # real whisper checkpoints ship vocab.json (the byte-level BPE
    # detokenizer the align rung needs) — provision one alongside
    b2u = jtok._bytes_to_unicode()
    vocab = {"".join(b2u[b] for b in f" tok{i}".encode()): i
             for i in range(wh_cfg.vocab_size)}
    (src / "vocab.json").write_text(json.dumps(vocab))
    monkeypatch.setenv("TPU_REAL_WEIGHTS_DIR", str(tmp_path / "real"))
    monkeypatch.setenv("HF_HOME", str(tmp_path / "no_hf"))

    found = find_real_checkpoints()
    assert found == {"whisper": str(src)}
    weights_dir = tmp_path / "weights"
    converted = convert_found_into(str(weights_dir), found)
    assert set(converted) == {"whisper"}
    assert converted["whisper"].d_model == 32  # derived from the checkpoint
    wdir = weights_dir / "openai__whisper-base"
    assert (wdir / "model.npz").exists()
    assert (wdir / "vocab.json").exists()

    sr = 16000
    t = np.arange(int(sr * 1.5)) / sr
    pcm = (np.sin(2 * np.pi * 330 * t) * 0.3 * 32767).astype(np.int16)
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(sr)
        fh.writeframes(pcm.tobytes())

    cfg = settings_mod.load_settings({
        "WEIGHTS_DIR": str(weights_dir), "MODEL_ASR": "openai/whisper-base",
        "MODEL_ASR_WORD_ALIGN": "1"})
    runtime = asr.WhisperRuntime(cfg, max_tokens=8)
    assert runtime.available()
    segments = runtime.transcribe_wav(str(wav))  # the ladder contract
    assert segments and segments[0].text
    # word spans flowed through (align rung on + vocab.json present)
    assert segments[0].words, segments[0]
    for word, start, end in segments[0].words:
        assert word.startswith("tok")
        assert 0.0 <= start <= end <= 1.5 + 1e-6
