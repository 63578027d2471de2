"""Shared Gemini client construction (grounded answers + study notes).

One definition of the api-key gate, import gate, and model construction for
:mod:`mmrag_tpu.rag.generate` and :mod:`mmrag_tpu.utils.note_builder`
(review finding: the two call sites had drifted into near-identical
15-line blocks that had to change in lockstep). Returns ``None`` whenever
Gemini is unavailable — callers own their offline fallbacks (abstention
snippets / heuristic notes), the reference's degrade ladder
(``app/utils/note_builder.py:73-82``).
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


def get_model(cfg) -> Optional[object]:
    """Configured ``genai.GenerativeModel`` or None (no key / no sdk)."""

    if not cfg.gemini.api_key:
        return None
    try:
        import google.generativeai as genai
    except ImportError:
        logger.warning("google-generativeai not installed; offline fallback")
        return None
    try:
        genai.configure(api_key=cfg.gemini.api_key)
        return genai.GenerativeModel(cfg.gemini.model)
    except Exception:
        logger.exception("Gemini model construction failed")
        return None
