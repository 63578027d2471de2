"""Settings loader: defaults, env overrides, validation, reference env compat."""

import pytest

from mmrag_tpu.settings import SettingsError, load_settings


def test_defaults_match_reference_contract():
    s = load_settings({})
    assert s.models.text == "sentence-transformers/all-MiniLM-L6-v2"
    assert s.models.clip == "openai/clip-vit-base-patch32"
    assert s.models.reranker == "cross-encoder/ms-marco-MiniLM-L-6-v2"
    assert s.retrieval.index_topk_text == 50
    assert s.retrieval.index_topk_image == 12
    assert s.retrieval.rerank_topk == 8
    assert s.retrieval.final_n == 4
    assert s.retrieval.confidence_tau == pytest.approx(0.25)
    assert s.chunks.size_chars == 1200
    assert s.chunks.overlap_chars == 200
    assert s.youtube.max_frames == 120
    assert s.youtube.frame_dedup_delta == 6
    assert s.rate_limit.per_minute == 60
    assert s.api.api_keys == {"test-key": "test-user"}
    assert s.uploads.allowed_exts == (".pdf",)


def test_env_overrides_reference_names():
    s = load_settings(
        {
            "INDEX_TOPK_TEXT": "17",
            "CONFIDENCE_TAU": "0.5",
            "RERANK_ENABLED": "false",
            "API_KEYS": '{"k1": "u1", "k2": "u2"}',
            "ALLOWED_UPLOAD_EXTS": ".pdf,.PDF , .txt",
            "LANCEDB_DIR": "/tmp/lance",
        }
    )
    assert s.retrieval.index_topk_text == 17
    assert s.retrieval.confidence_tau == 0.5
    assert s.retrieval.use_rerank is False
    assert s.api.api_keys == {"k1": "u1", "k2": "u2"}
    assert s.uploads.allowed_exts == (".pdf", ".pdf", ".txt")
    # LANCEDB_DIR aliases the index root for reference-.env compatibility
    assert s.paths.index_dir == "/tmp/lance"


def test_tpu_index_dir_wins_over_alias():
    s = load_settings({"LANCEDB_DIR": "/tmp/lance", "TPU_INDEX_DIR": "/tmp/tpu"})
    assert s.paths.index_dir == "/tmp/tpu"


@pytest.mark.parametrize(
    "env",
    [
        {"INDEX_TOPK_TEXT": "abc"},
        {"CONFIDENCE_TAU": "not-a-float"},
        {"RERANK_ENABLED": "maybe"},
        {"API_KEYS": "not json"},
        {"API_KEYS": "[1,2]"},
        {"FINAL_N": "0"},
        {"TPU_TEXT_BATCH_BUCKETS": "8,-4"},
    ],
)
def test_invalid_env_raises(env):
    with pytest.raises(SettingsError):
        load_settings(env)


def test_tpu_buckets_sorted():
    s = load_settings({"TPU_TEXT_BATCH_BUCKETS": "128,8,32"})
    assert s.tpu.text_batch_buckets == (8, 32, 128)


def test_default_seq_buckets_include_384():
    """The 384 bucket sits between the splitter shapes: attention is
    quadratic in the padded bucket, so a ~300-token chunk embeds 1.52x
    faster than padded to 512 (config.py rationale)."""

    s = load_settings({})
    assert 384 in s.tpu.text_seq_buckets
    assert s.tpu.text_seq_buckets == tuple(sorted(s.tpu.text_seq_buckets))


def test_index_dtype_knob_is_independent():
    from mmrag_tpu.settings import load_settings

    cfg = load_settings({"TPU_INDEX_DTYPE": "int8"})
    assert cfg.tpu.index_dtype == "int8"
    assert cfg.tpu.compute_dtype == "bfloat16"  # encoders unaffected
    assert load_settings({}).tpu.index_dtype == ""  # follows compute_dtype
