"""In-process TTL caches for query embeddings, retrieval results, and chat.

Contract matches the reference cache layer
(``/root/reference/app/cache/__init__.py:17-111``): three TTL dict caches
(embed 300s, retrieval 120s, chat 60s), query normalization
(lowercase + whitespace collapse), retrieval/chat keys that embed the
per-user index version (so writes invalidate), and a ``clear_all_caches``
test hook. Thread-safe; TTLs come from settings at call time so tests can
override.
"""

from __future__ import annotations

import functools
import re
import threading
import time
from typing import Any, Callable, Dict, Hashable, Optional, Tuple

import numpy as np

from ..settings import settings as _settings

_WS = re.compile(r"\s+")


def normalize_query(query: str) -> str:
    return _WS.sub(" ", query.strip().lower())


class TTLCache:
    """A small thread-safe TTL map with opportunistic expiry sweeping."""

    def __init__(self, ttl_sec: float, max_items: int = 4096) -> None:
        self.ttl_sec = ttl_sec
        self.max_items = max_items
        self._lock = threading.Lock()
        self._data: Dict[Hashable, Tuple[float, Any]] = {}

    def get(self, key: Hashable) -> Optional[Any]:
        now = time.monotonic()
        with self._lock:
            entry = self._data.get(key)
            if entry is None:
                return None
            expires, value = entry
            if expires < now:
                del self._data[key]
                return None
            return value

    def set(self, key: Hashable, value: Any, ttl_sec: Optional[float] = None) -> None:
        ttl = self.ttl_sec if ttl_sec is None else ttl_sec
        now = time.monotonic()
        with self._lock:
            if len(self._data) >= self.max_items:
                self._sweep_locked(now)
                if len(self._data) >= self.max_items:
                    # Evict oldest-expiring half to bound memory.
                    for k, _ in sorted(self._data.items(), key=lambda kv: kv[1][0])[
                        : self.max_items // 2
                    ]:
                        del self._data[k]
            self._data[key] = (now + ttl, value)

    def _sweep_locked(self, now: float) -> None:
        dead = [k for k, (exp, _) in self._data.items() if exp < now]
        for k in dead:
            del self._data[k]

    def clear(self) -> None:
        with self._lock:
            self._data.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._data)


_embed_cache = TTLCache(_settings.cache.embed_ttl_sec)
_retrieval_cache = TTLCache(_settings.cache.retrieval_ttl_sec)
_chat_cache = TTLCache(_settings.cache.chat_ttl_sec)


def get_query_embeddings(query: str) -> Optional[Dict[str, np.ndarray]]:
    return _embed_cache.get(normalize_query(query))


def set_query_embeddings(query: str, embeds: Dict[str, np.ndarray]) -> None:
    _embed_cache.set(normalize_query(query), embeds, _settings.cache.embed_ttl_sec)


def _retrieval_key(user_id: str, query: str, index_version: int) -> Tuple[str, str, int]:
    return (user_id, normalize_query(query), index_version)


def get_retrieval_results(user_id: str, query: str, index_version: int) -> Optional[Any]:
    return _retrieval_cache.get(_retrieval_key(user_id, query, index_version))


def set_retrieval_results(
    user_id: str, query: str, index_version: int, results: Any
) -> None:
    _retrieval_cache.set(
        _retrieval_key(user_id, query, index_version),
        results,
        _settings.cache.retrieval_ttl_sec,
    )


def chat_cache(version_fn: Callable[[str], int]) -> Callable:
    """Decorator caching chat responses keyed (user, query, index_version).

    ``version_fn(user_id)`` supplies the current index version, mirroring the
    reference decorator (``app/cache/__init__.py:86-111``).
    """

    def decorator(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(user_id: str, query: str, *args: Any, **kwargs: Any) -> Any:
            version = version_fn(user_id)
            key = (user_id, normalize_query(query), version,
                   repr(args), repr(sorted(kwargs.items())))
            cached = _chat_cache.get(key)
            if cached is not None:
                return cached
            result = fn(user_id, query, *args, **kwargs)
            _chat_cache.set(key, result, _settings.cache.chat_ttl_sec)
            return result

        return wrapper

    return decorator


def clear_all_caches() -> None:
    """Test hook (reference ``app/cache/__init__.py:34-38``)."""

    _embed_cache.clear()
    _retrieval_cache.clear()
    _chat_cache.clear()
