"""Text chunking: char sliding window + sentence-aware token splitter.

Two stages, mirroring the reference:
  * :func:`chunk_text` / :func:`chunk_pages` — character sliding window
    (default 1200 chars / 200 overlap), the reference's first-stage chunker
    (``/root/reference/app/utils/text_chunk.py:3-33``).
  * :func:`sentence_split` — second-stage sentence-aware splitter with token
    budget 512 / overlap 64, the role LlamaIndex ``SentenceSplitter(512, 64)``
    plays in the reference index builder (``app/ml/index_build.py:14,64``).
    Tokens are approximated as whitespace words (tokenizer-free, host-cheap);
    sentence boundaries are respected so embeddings see coherent spans.

Long-context is handled by chunking, not sequence parallelism — an explicit
non-goal matching the reference (SURVEY §5).
"""

from __future__ import annotations

import re
from typing import Iterable, List, Tuple

_SENTENCE_END = re.compile(r"(?<=[.!?])\s+|\n{2,}")


def chunk_text(text: str, size_chars: int = 1200, overlap_chars: int = 200) -> List[str]:
    """Character sliding window; last chunk may be short; empty -> []."""

    if size_chars <= 0:
        raise ValueError("size_chars must be positive")
    if overlap_chars >= size_chars:
        raise ValueError("overlap_chars must be smaller than size_chars")
    text = text.strip()
    if not text:
        return []
    step = size_chars - overlap_chars
    chunks = []
    for start in range(0, len(text), step):
        piece = text[start : start + size_chars].strip()
        if piece:
            chunks.append(piece)
        if start + size_chars >= len(text):
            break
    return chunks


def chunk_pages(
    pages: Iterable[Tuple[int, str]], size_chars: int = 1200, overlap_chars: int = 200
) -> List[Tuple[int, str]]:
    """Page-wise variant: returns (page_number, chunk) pairs."""

    out: List[Tuple[int, str]] = []
    for page_no, text in pages:
        for piece in chunk_text(text, size_chars, overlap_chars):
            out.append((page_no, piece))
    return out


def split_sentences(text: str) -> List[str]:
    return [s.strip() for s in _SENTENCE_END.split(text) if s.strip()]


def sentence_split(
    text: str, chunk_tokens: int = 512, overlap_tokens: int = 64
) -> List[str]:
    """Pack sentences into ~chunk_tokens-word chunks with sentence overlap.

    A sentence longer than the budget is hard-split on word boundaries.
    """

    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    sentences: List[List[str]] = []
    for sent in split_sentences(text):
        words = sent.split()
        while len(words) > chunk_tokens:
            sentences.append(words[:chunk_tokens])
            words = words[chunk_tokens:]
        if words:
            sentences.append(words)
    if not sentences:
        return []

    chunks: List[str] = []
    current: List[List[str]] = []
    current_len = 0
    for words in sentences:
        if current and current_len + len(words) > chunk_tokens:
            chunks.append(" ".join(w for s in current for w in s))
            # carry trailing sentences as overlap, newest first
            carry: List[List[str]] = []
            carried = 0
            for prev in reversed(current):
                if carried + len(prev) > overlap_tokens:
                    break
                carry.insert(0, prev)
                carried += len(prev)
            current = carry
            current_len = carried
        current.append(words)
        current_len += len(words)
    if current:
        chunks.append(" ".join(w for s in current for w in s))
    return chunks
