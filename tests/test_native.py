"""Native host runtime: C++ path vs numpy fallback parity.

Skips the native half gracefully when g++ is unavailable; the fallback half
always runs, so the suite stays green on compiler-less machines.
"""

import numpy as np
import pytest

from mmrag_tpu import native


def _both(fn, *args, **kw):
    """Run fn with the native lib and with fallbacks forced, return both."""

    got_native = fn(*args, **kw)
    lib, failed = native._lib, native._build_failed
    native._lib, native._build_failed = None, True
    try:
        got_fallback = fn(*args, **kw)
    finally:
        native._lib, native._build_failed = lib, failed
    return got_native, got_fallback


@pytest.fixture(scope="module")
def has_native():
    return native.available()


def test_bf16_roundtrip_matches_ml_dtypes(rng, has_native):
    import ml_dtypes

    x = rng.standard_normal((256, 48)).astype(np.float32)
    bits, bits_fb = _both(native.f32_to_bf16, x)
    want = x.astype(ml_dtypes.bfloat16).view(np.uint16)
    np.testing.assert_array_equal(bits_fb, want)
    if has_native:
        np.testing.assert_array_equal(bits, want)
    back = native.bf16_to_f32(bits)
    np.testing.assert_allclose(back, x, rtol=8e-3)


def test_bf16_handles_specials(has_native):
    x = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-40], dtype=np.float32)
    bits, bits_fb = _both(native.f32_to_bf16, x)
    np.testing.assert_array_equal(bits, bits_fb)
    back = native.bf16_to_f32(bits)
    assert np.isnan(back[0]) and np.isposinf(back[1]) and np.isneginf(back[2])


def test_gather_rows(rng):
    src = rng.standard_normal((100, 17)).astype(np.float32)
    rows = rng.integers(0, 100, 40)
    got, fb = _both(native.gather_rows, src, rows)
    np.testing.assert_array_equal(got, src[rows])
    np.testing.assert_array_equal(fb, src[rows])


def test_hamming_dedup_sequential_semantics():
    # h0 kept; h1 within 2 bits of h0 -> dropped; h2 within 2 bits of h1 but
    # NOT of h0 -> kept (distance is measured against *kept* hashes only).
    h0 = 0
    h1 = 0b11  # dist 2 from h0
    h2 = 0b1111  # dist 4 from h0, dist 2 from h1
    keep, keep_fb = _both(
        native.hamming_dedup, np.array([h0, h1, h2], np.uint64), 2
    )
    np.testing.assert_array_equal(keep, [True, False, True])
    np.testing.assert_array_equal(keep_fb, keep)


def test_hamming_dedup_parity_random(rng):
    h = rng.integers(0, 2**30, 300, dtype=np.uint64)  # small space -> collisions
    got, fb = _both(native.hamming_dedup, h, 6)
    np.testing.assert_array_equal(got, fb)


def test_hamming_matrix(rng):
    a = rng.integers(0, 2**63, 20, dtype=np.uint64)
    b = rng.integers(0, 2**63, 30, dtype=np.uint64)
    got, fb = _both(native.hamming_matrix, a, b)
    np.testing.assert_array_equal(got, fb)
    assert got[0, 0] == bin(int(a[0]) ^ int(b[0])).count("1")


def test_merge_topk_matches_global_sort(rng):
    shards, q, k = 4, 3, 8
    scores = rng.standard_normal((shards, q, k)).astype(np.float32)
    scores = -np.sort(-scores, axis=-1)  # per-shard lists arrive sorted
    ids = rng.permutation(shards * q * k).reshape(shards, q, k).astype(np.int64)
    (gs, gi), (fs, fi) = _both(native.merge_topk, scores, ids, k)
    np.testing.assert_array_equal(gs, fs)
    np.testing.assert_array_equal(gi, fi)
    flat = scores.transpose(1, 0, 2).reshape(q, -1)
    want = -np.sort(-flat, axis=-1)[:, :k]
    np.testing.assert_array_equal(gs, want)


def test_merge_topk_fillers(rng):
    scores = np.full((2, 1, 3), -1e30, np.float32)
    scores[0, 0, 0] = 0.5
    ids = np.arange(6, dtype=np.int64).reshape(2, 1, 3)
    gs, gi = native.merge_topk(scores, ids, 3)
    assert gs[0, 0] == np.float32(0.5) and gi[0, 0] == 0
    assert (gs[0, 1:] <= -1e29).all()


def test_l2_normalize_rows(rng):
    x = rng.standard_normal((50, 9)).astype(np.float32)
    x[7] = 0.0  # zero row stays zero (zero-safe)
    got, fb = _both(native.l2_normalize_rows, x)
    np.testing.assert_allclose(got, fb, atol=1e-6)
    norms = np.linalg.norm(got, axis=1)
    assert abs(norms[0] - 1.0) < 1e-5 and norms[7] == 0.0


def test_gather_rows_rejects_out_of_range(rng):
    src = rng.standard_normal((10, 4)).astype(np.float32)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.asarray([0, -1], np.int64))
    with pytest.raises(IndexError):
        native.gather_rows(src, np.asarray([10], np.int64))


WP_VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
    "hello": 4, "world": 5, "un": 6, "##aff": 7, "##able": 8, ",": 9,
    "the": 10, "a": 11, "##b": 12, "##c": 13, "ab": 14, "1": 15, "##2": 16,
    "x": 17, "##x": 18, "_": 19, "-": 20, ".": 21,
}


def _wp_pair():
    """Same tokenizer twice: native-enabled and native-stripped (pure Python)."""

    from mmrag_tpu.models.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(dict(WP_VOCAB))
    py = WordPieceTokenizer(dict(WP_VOCAB))
    py._native = None
    return tok, py


def test_wordpiece_native_matches_python_random(rng, has_native):
    if not has_native:
        pytest.skip("no native lib")
    tok, py = _wp_pair()
    assert tok._native is not None
    pool = list("abcx12_ ,.-\t\n") + ["hello", "world", "unaffable", "the", "AB"]
    for _ in range(300):
        parts = [pool[i] for i in rng.integers(0, len(pool), rng.integers(0, 12))]
        s = "".join(parts)
        assert tok.tokenize_ids(s) == py.tokenize_ids(s), repr(s)


def test_wordpiece_native_edge_cases(has_native):
    tok, py = _wp_pair()
    cases = [
        "",
        "Hello, WORLD",
        "unaffable",
        "a" * 100,        # exactly at the per-word char cap
        "a" * 101,        # over the cap -> whole-word [UNK]
        "ab" * 80,        # long word, overflow accumulation path
        "a\x1cb",         # \x1c is Python str.split() whitespace
        "a\x01b",         # \x01 is a punctuation-class single token
        "x!!y",
        " \t\n ",
        "a.b,c-d_e",
    ]
    for s in cases:
        assert tok.tokenize_ids(s) == py.tokenize_ids(s), repr(s)


def test_wordpiece_native_non_ascii_falls_back(has_native):
    if not has_native:
        pytest.skip("no native lib")
    tok, py = _wp_pair()
    for s in ["café", "naïve hello", "東京 world", "héllo, wörld"]:
        assert tok._native.tokenize(s) is None  # kernel declines
        assert tok.tokenize_ids(s) == py.tokenize_ids(s)  # fallback agrees


def test_wordpiece_sparse_vocab_disables_native(has_native):
    if not has_native:
        pytest.skip("no native lib")
    from mmrag_tpu import native as nat

    sparse = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "hello": 99}
    assert nat.wordpiece_create(sparse, 1) is None
    from mmrag_tpu.models.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(sparse)
    assert tok._native is None
    assert tok.tokenize_ids("hello xyzzy") == [99, 1]


def test_wordpiece_tokenize_matrix_matches_tokenize_ids(rng, has_native):
    """The batched matrix path (native rows + Python fallback rows mixed)
    produces exactly the per-text tokenize_ids streams."""

    tok, py = _wp_pair()
    texts = [
        "hello world, the unaffable ab",
        "café naïve",          # non-ASCII -> per-row Python fallback
        "",
        "a" * 120,             # over the word cap
        "x " * 50,
    ]
    for impl in (tok, py):
        buf, lengths = impl.tokenize_matrix(texts)
        assert buf.dtype == np.int32 and lengths.shape == (len(texts),)
        for i, t in enumerate(texts):
            want = impl.tokenize_ids(t)
            assert buf[i, : lengths[i]].tolist() == want, repr(t)
            assert (buf[i, lengths[i] :] == impl.pad_id).all()


def test_embed_text_matrix_assembly_matches_list_path(tmp_path):
    """embed_text_batch's numpy [CLS] body [SEP] assembly (tokenize_matrix
    branch) is bit-identical to the legacy list path, including truncation
    and unicode fallback rows."""

    import jax
    jax.config.update("jax_platforms", "cpu")
    from mmrag_tpu.models import runtime as rtmod
    from mmrag_tpu.models.tokenizer import WordPieceTokenizer
    from mmrag_tpu.settings import load_settings

    cfg = load_settings({"WEIGHTS_DIR": str(tmp_path / "w")})
    from mmrag_tpu.models.bert import BertConfig

    tiny = BertConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128)
    rtmod.reset_runtime()
    enc = rtmod.EncoderRuntime(cfg, bert_cfg=tiny)
    enc._ensure_minilm()
    wp = WordPieceTokenizer(dict(WP_VOCAB))
    enc._bert_tok = wp
    texts = ["hello world", "café the unaffable", "ab " * 400, ""]
    got = enc.embed_text_batch(texts)

    class ListOnly:
        """Same tokenizer minus tokenize_matrix -> legacy list branch."""

        def __init__(self, inner):
            self._inner = inner
            self.cls_id, self.sep_id, self.pad_id = (
                inner.cls_id, inner.sep_id, inner.pad_id,
            )

        def tokenize_ids(self, text):
            return self._inner.tokenize_ids(text)

    enc._bert_tok = ListOnly(wp)
    want = enc.embed_text_batch(texts)
    np.testing.assert_array_equal(got, want)
    rtmod.reset_runtime()


def test_merge_topk_nan_scores_sink(rng):
    """NaN scores (poisoned embeddings) order as -inf instead of invoking
    UB in the native comparator."""

    scores = np.asarray([[[np.nan, 0.5, 0.1]], [[0.9, np.nan, 0.2]]], np.float32)
    ids = np.asarray([[[1, 2, 3]], [[4, 5, 6]]], np.int64)
    out_s, out_i = native.merge_topk(scores, ids, 3)
    assert out_i[0].tolist() == [4, 2, 6]
    assert np.all(np.isfinite(out_s[0]) | (out_s[0] <= -1e29) | np.isnan(out_s[0]))
