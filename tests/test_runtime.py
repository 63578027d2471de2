"""EncoderRuntime: shapes, normalization, bucketing, determinism, weights dir."""

import numpy as np
import pytest

from mmrag_tpu.models import runtime as rt
from mmrag_tpu.settings import load_settings


from mmrag_tpu.models.bert import BertConfig
from mmrag_tpu.models.clip import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

# Tiny geometries keep CPU compiles fast; full-size numerics are covered by
# tests/test_model_parity.py. Vocab sizes stay real so HashTokenizer ids fit.
TINY_BERT = BertConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128)
TINY_CLIP = CLIPConfig(
    vision=CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128),
    text=CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64),
    projection_dim=512,
)


@pytest.fixture()
def enc(tmp_path):
    cfg = load_settings({"WEIGHTS_DIR": str(tmp_path / "weights")})
    rt.reset_runtime()
    yield rt.EncoderRuntime(cfg, bert_cfg=TINY_BERT, clip_cfg=TINY_CLIP)
    rt.reset_runtime()


def test_text_embeddings_shape_and_norm(enc):
    embs = enc.embed_text_batch(["hello world", "a longer sentence about things", "x"])
    assert embs.shape == (3, 64) and embs.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-5)
    assert enc.embed_text_batch([]).shape == (0, 64)


def test_text_embeddings_deterministic_and_batch_invariant(enc):
    one = enc.embed_text_batch(["the same sentence"])
    many = enc.embed_text_batch(["the same sentence", "another one", "third"])
    np.testing.assert_allclose(one[0], many[0], atol=1e-5)


def test_image_embeddings_mixed_sizes(enc, rng):
    imgs = [
        rng.integers(0, 255, (64, 96, 3)).astype(np.uint8),
        rng.integers(0, 255, (224, 224, 3)).astype(np.uint8),
    ]
    embs = enc.embed_images_batch(imgs)
    assert embs.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-4)
    assert enc.embed_images_batch([]).shape == (0, 512)


def test_query_for_images(enc):
    vec = enc.embed_query_for_images("a diagram of a cell")
    assert vec.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)


def test_rerank_scores(enc):
    scores = enc.rerank_scores("query", ["passage one", "another passage", "third"])
    assert scores.shape == (3,) and scores.dtype == np.float32
    assert enc.rerank_scores("query", []).shape == (0,)
    # deterministic
    again = enc.rerank_scores("query", ["passage one", "another passage", "third"])
    np.testing.assert_allclose(scores, again, atol=1e-5)


def test_image_file_decode(enc, tmp_path, rng):
    from PIL import Image

    path = tmp_path / "img.png"
    arr = rng.integers(0, 255, (50, 70, 3)).astype(np.uint8)
    Image.fromarray(arr).save(path)
    embs = enc.embed_image_files([str(path)])
    assert embs.shape == (1, 512)


def test_get_runtime_singleton():
    rt.reset_runtime()
    a = rt.get_runtime()
    b = rt.get_runtime()
    assert a is b
    rt.reset_runtime()


def test_text_embed_truncates_at_st_max_seq_length(tmp_path):
    """Reference parity (r3 audit): SentenceTransformer("all-MiniLM-L6-v2")
    sets max_seq_length=256, so the reference embeds every chunk on its
    first 256 tokens even though the splitter emits up to 512. Our embed
    path must do the same by default: a long text embeds identically to its
    own 254-token prefix — and TPU_TEXT_EMBED_MAX_LEN=0 restores full-length
    embedding (which then differs)."""

    import numpy as np

    from mmrag_tpu.models.runtime import EncoderRuntime
    from mmrag_tpu.settings import load_settings

    base = {"TPU_COMPUTE_DTYPE": "float32", "WEIGHTS_DIR": str(tmp_path)}
    rt = EncoderRuntime(load_settings(base))
    rt.embed_text_batch(["warm"])  # lazily initializes the tokenizer
    words = [f"tok{i}" for i in range(600)]
    long_text = " ".join(words)
    toks = rt._bert_tok.tokenize_ids(long_text)
    assert len(toks) > 300, "fixture must exceed the 256-token cap"
    # byte-reconstruct the 254-token prefix as text via the same tokenizer:
    # hash-tokenizer maps one word -> one token, so the prefix is words[:254]
    prefix_text = " ".join(words[:254])

    full = rt.embed_text_batch([long_text])
    prefix = rt.embed_text_batch([prefix_text])
    np.testing.assert_allclose(full, prefix, atol=1e-6)

    uncapped = EncoderRuntime(
        load_settings({**base, "TPU_TEXT_EMBED_MAX_LEN": "0"})
    )
    full_u = uncapped.embed_text_batch([long_text])
    assert np.abs(full_u - full).max() > 1e-3  # genuinely longer input


def test_rerank_chunk_decomposition_invariants(enc):
    """The single-definition (start, length, padded) decomposition behind
    rerank_pairs and the serving warmup's rerank_bucket_sizes: chunks must
    tile [0, n) contiguously, pad each chunk up to its bucket, and the
    bucket-size prediction must be exactly the padded sizes the executor
    dispatches (they share _rerank_chunks, so a drift here means the
    warmup would compile the wrong executables again — the advisor-r4
    O(max^2 x topk) sweep regression)."""

    buckets = enc.cfg.tpu.text_batch_buckets
    for n in (1, 2, 7, 8, 31, max(buckets), max(buckets) + 3,
              2 * max(buckets) + 1):
        chunks = enc._rerank_chunks(n)
        assert chunks[0][0] == 0
        covered = 0
        for start, length, padded in chunks:
            assert start == covered and length >= 1
            assert padded >= length
            covered += length
        assert covered == n
        assert enc.rerank_bucket_sizes(n) == tuple(p for _, _, p in chunks)
