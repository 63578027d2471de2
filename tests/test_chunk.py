"""Chunkers: char window semantics (1200/200 contract) + sentence splitter."""

import pytest

from mmrag_tpu.ingest.chunk import chunk_pages, chunk_text, sentence_split, split_sentences


def test_chunk_text_window_and_overlap():
    text = "abcdefghij" * 30  # 300 chars
    chunks = chunk_text(text, size_chars=100, overlap_chars=20)
    assert all(len(c) <= 100 for c in chunks)
    assert chunks[0][-20:] == chunks[1][:20]  # overlap preserved
    joined = chunks[0] + "".join(c[20:] for c in chunks[1:])
    assert joined == text  # lossless reconstruction


def test_chunk_text_edges():
    assert chunk_text("") == []
    assert chunk_text("   ") == []
    assert chunk_text("short", 100, 20) == ["short"]
    with pytest.raises(ValueError):
        chunk_text("x", size_chars=0)
    with pytest.raises(ValueError):
        chunk_text("x", size_chars=10, overlap_chars=10)


def test_chunk_pages():
    pages = [(1, "a" * 150), (2, "b" * 50)]
    out = chunk_pages(pages, size_chars=100, overlap_chars=0)
    assert [p for p, _ in out] == [1, 1, 2]


def test_split_sentences():
    text = "First sentence. Second one! Third?\n\nParagraph break here"
    assert split_sentences(text) == [
        "First sentence.", "Second one!", "Third?", "Paragraph break here",
    ]


def test_sentence_split_packing():
    sents = [f"Sentence number {i} has exactly six words." for i in range(20)]
    text = " ".join(sents)
    chunks = sentence_split(text, chunk_tokens=20, overlap_tokens=7)
    assert len(chunks) > 1
    for c in chunks[:-1]:
        assert len(c.split()) <= 20
    # sentence-overlap: each chunk after the first starts with the previous
    # chunk's trailing sentence
    for prev, cur in zip(chunks, chunks[1:]):
        first_sentence = cur.split(".")[0] + "."
        assert first_sentence in prev


def test_sentence_split_long_sentence_hard_split():
    text = " ".join(f"w{i}" for i in range(100))  # one 100-word "sentence"
    chunks = sentence_split(text, chunk_tokens=30, overlap_tokens=5)
    assert all(len(c.split()) <= 30 for c in chunks)
    assert sum(len(c.split()) for c in chunks) >= 100


def test_sentence_split_empty():
    assert sentence_split("") == []
    assert sentence_split("   \n  ") == []
