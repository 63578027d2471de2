"""TTL caches: normalization hits, version-keyed invalidation, chat decorator
(reference test_cache.py coverage + TTL expiry)."""

import numpy as np

from mmrag_tpu import cache


def test_query_normalization_hit():
    cache.set_query_embeddings("  Hello   World ", {"text": np.ones(3)})
    got = cache.get_query_embeddings("hello world")
    assert got is not None and np.allclose(got["text"], 1.0)


def test_retrieval_cache_version_invalidation():
    cache.set_retrieval_results("u1", "q", 1, ["hit"])
    assert cache.get_retrieval_results("u1", "Q ", 1) == ["hit"]
    assert cache.get_retrieval_results("u1", "q", 2) is None  # version bump invalidates
    assert cache.get_retrieval_results("u2", "q", 1) is None  # tenant isolation


def test_ttl_expiry(monkeypatch):
    c = cache.TTLCache(ttl_sec=100.0)
    t = [0.0]
    monkeypatch.setattr(cache.time, "monotonic", lambda: t[0])
    c.set("k", "v")
    assert c.get("k") == "v"
    t[0] = 101.0
    assert c.get("k") is None


def test_chat_cache_decorator():
    version = {"u1": 1}
    calls = []

    @cache.chat_cache(lambda user: version[user])
    def answer(user_id, query):
        calls.append(query)
        return f"answer:{query}"

    assert answer("u1", "What?") == "answer:What?"
    assert answer("u1", "  what? ") == "answer:What?"  # normalized hit, cached
    assert calls == ["What?"]
    version["u1"] = 2  # index write → invalidate
    assert answer("u1", "what?") == "answer:what?"
    assert len(calls) == 2


def test_eviction_bounds_memory():
    c = cache.TTLCache(ttl_sec=1000.0, max_items=10)
    for i in range(25):
        c.set(i, i)
    assert len(c) <= 10
