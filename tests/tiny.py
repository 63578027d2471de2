"""Shared tiny model geometries for fast CPU tests (full-size numerics are
covered by tests/test_model_parity.py)."""

from mmrag_tpu.models.bert import BertConfig
from mmrag_tpu.models.clip import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

TINY_BERT = BertConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128)
TINY_CLIP = CLIPConfig(
    vision=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128),
    text=CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64),
    projection_dim=512,
)


def tiny_engine(tmp_path, extra_env=None):
    """Build an isolated RagEngine over tiny encoders in tmp_path."""

    from mmrag_tpu.models.runtime import EncoderRuntime
    from mmrag_tpu.rag.engine import RagEngine
    from mmrag_tpu.settings import load_settings

    env = {
        "TPU_INDEX_DIR": str(tmp_path / "index"),
        "NOTES_DB_PATH": str(tmp_path / "notes.db"),
        "WEIGHTS_DIR": str(tmp_path / "weights"),
        "MEDIA_DIR": str(tmp_path / "media"),
        "INGEST_CACHE_DIR": str(tmp_path / "cache"),
        "TPU_COMPUTE_DTYPE": "float32",
        "TPU_TEXT_BATCH_BUCKETS": "4,16",
        "TPU_TEXT_SEQ_BUCKETS": "32,128",
        "TPU_IMAGE_BATCH_BUCKETS": "4,8",
        # direct (unbatched) retrieval path by default: unit tests
        # monkeypatch retrieve_text/retrieve_images as their seam
        "TPU_MICROBATCH_WINDOW_MS": "0",
    }
    env.update(extra_env or {})
    cfg = load_settings(env)
    runtime = EncoderRuntime(cfg, bert_cfg=TINY_BERT, clip_cfg=TINY_CLIP)
    return RagEngine(cfg, runtime)
