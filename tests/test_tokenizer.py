"""Tokenizers: WordPiece greedy matching, pair encoding, CLIP BPE merges,
hash fallback contract."""

import numpy as np
import pytest

from mmrag_tpu.models.tokenizer import (
    ClipBPETokenizer,
    HashTokenizer,
    WordPieceTokenizer,
    load_bert_tokenizer,
    load_clip_tokenizer,
)

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
    "hello": 4, "world": 5, "un": 6, "##aff": 7, "##able": 8, ",": 9, "the": 10,
}


@pytest.fixture()
def wp():
    return WordPieceTokenizer(VOCAB)


def test_wordpiece_greedy_longest_match(wp):
    assert wp.tokenize_ids("unaffable") == [6, 7, 8]
    assert wp.tokenize_ids("Hello, WORLD") == [4, 9, 5]  # lowercase + punct split
    assert wp.tokenize_ids("xyzzy") == [1]  # unknown


def test_encode_layout_and_padding(wp):
    ids, mask = wp.encode(["hello world", "the"], max_len=8)
    assert ids.shape == (2, 8)
    np.testing.assert_array_equal(ids[0], [2, 4, 5, 3, 0, 0, 0, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(ids[1], [2, 10, 3, 0, 0, 0, 0, 0])


def test_encode_truncates(wp):
    ids, mask = wp.encode(["hello world hello world hello"], max_len=4)
    np.testing.assert_array_equal(ids[0], [2, 4, 5, 3])  # CLS + 2 tokens + SEP


def test_encode_pairs_types_and_truncation(wp):
    ids, mask, tt = wp.encode_pairs(["hello"], ["world the world"], max_len=8)
    np.testing.assert_array_equal(ids[0], [2, 4, 3, 5, 10, 5, 3, 0])
    np.testing.assert_array_equal(tt[0], [0, 0, 0, 1, 1, 1, 1, 0])
    # longest-first truncation: long passage shrinks before short query
    ids2, _, _ = wp.encode_pairs(["hello"], ["world the world the world"], max_len=7)
    assert ids2[0, 1] == 4  # query survives


def test_clip_bpe_merges():
    vocab = {
        "<|startoftext|>": 97, "<|endoftext|>": 98,
        "l": 1, "o": 2, "w": 3, "e": 4, "r": 5, "</w>": 6,
        "lo": 7, "low": 8, "er</w>": 9, "low</w>": 10, "r</w>": 11,
    }
    # the </w> marker rides on the last character, so whole-word merges pair
    # against "w</w>" (CLIP merges file convention)
    merges = [("l", "o"), ("e", "r</w>"), ("lo", "w"), ("lo", "w</w>")]
    bpe = ClipBPETokenizer(vocab, merges)
    # "lower" -> low + er</w>; "low" -> low</w>
    assert bpe.tokenize_ids("lower") == [8, 9]
    assert bpe.tokenize_ids("low") == [10]
    ids, mask = bpe.encode(["lower low"], max_len=6)
    np.testing.assert_array_equal(ids[0], [97, 8, 9, 10, 98, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 1, 0])


def test_hash_tokenizer_contracts():
    ht = HashTokenizer(style="bert")
    ids, mask = ht.encode(["some words here"], max_len=6)
    assert ids[0, 0] == 101 and ids[0, 4] == 102  # CLS ... SEP
    a, _ = ht.encode(["same text"], max_len=6)
    b, _ = ht.encode(["same text"], max_len=6)
    np.testing.assert_array_equal(a, b)  # deterministic

    hc = HashTokenizer(style="clip", vocab_size=49408)
    ids, _ = hc.encode(["a query"], max_len=8)
    assert ids[0, 0] == 49406
    # EOT must be the max id in the row (argmax pooling depends on it)
    assert ids[0].max() == 49407 and np.argmax(ids[0]) == 3

    pair_ids, _, tt = ht.encode_pairs(["q"], ["p p p"], max_len=8)
    assert pair_ids[0, 0] == 101 and tt[0].max() == 1


def test_loaders_fall_back_to_hash(tmp_path):
    assert isinstance(load_bert_tokenizer(str(tmp_path)), HashTokenizer)
    assert isinstance(load_clip_tokenizer(str(tmp_path)), HashTokenizer)


def test_loader_reads_vocab_file(tmp_path):
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello"]))
    tk = load_bert_tokenizer(str(tmp_path))
    assert isinstance(tk, WordPieceTokenizer)
    assert tk.tokenize_ids("hello") == [4]


def test_clip_bpe_matches_hf_on_unicode(tmp_path):
    """Byte-level mapping parity vs HF CLIPTokenizer built from the same
    generated vocab/merges files — exercises non-ASCII ("café", "→")."""

    import json

    transformers = pytest.importorskip("transformers")
    from mmrag_tpu.models.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    symbols = list(b2u.values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    merges = [("c", "a"), ("ca", "f"), ("1", "2</w>")]
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")

    hf = transformers.CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ours = ClipBPETokenizer.from_files(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))

    for text in ["cafe 12", "café über", "naïve → tpu!", "héllo wörld 7"]:
        want = hf(text)["input_ids"]
        got = [ours.bos_id, *ours.tokenize_ids(text), ours.eot_id]
        assert got == want, (text, got, want)


def test_wordpiece_matches_hf_bert_tokenizer(tmp_path):
    """WordPiece parity vs HF BertTokenizer built from the same generated
    vocab.txt — covers lowercasing, accent stripping, and punct splitting."""

    transformers = pytest.importorskip("transformers")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "cafe", "over", "##flow", "runs", "!", ",", "fast",
             "un", "##der", "##dog", "2", "##3"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    hf = transformers.BertTokenizer(str(tmp_path / "vocab.txt"), do_lower_case=True)
    from mmrag_tpu.models.tokenizer import WordPieceTokenizer

    ours = WordPieceTokenizer.from_vocab_file(str(tmp_path / "vocab.txt"))
    for text in [
        "The Café overflow runs fast!",
        "UNDERDOG, the underdog runs",
        "café 23 OVER##flow",  # literal ## chars in input, digits
        "the é́ runs",  # stacked combining accents
    ]:
        want = hf(text)["input_ids"]
        ids, mask = ours.encode([text], max_len=32)
        got = [int(t) for t in ids[0][: int(mask[0].sum())]]
        assert got == want, (text, got, want)
