"""MicroBatcher: coalescing, ordering, error propagation, engine wiring."""

import threading
import time

import numpy as np
import pytest

from mmrag_tpu.serving.batcher import MicroBatcher, QueryEmbedBatcher


def test_coalesces_concurrent_submits():
    calls = []

    def fn(items):
        calls.append(list(items))
        time.sleep(0.01)
        return [x * 2 for x in items]

    b = MicroBatcher(fn, max_batch=8, window_ms=30)
    results = {}

    def worker(i):
        results[i] = b.submit(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert results == {i: i * 2 for i in range(6)}
    assert b.batches_run < 6  # at least some coalescing happened
    assert sum(len(c) for c in calls) == 6


def test_max_batch_splits():
    def fn(items):
        assert len(items) <= 2
        return items

    b = MicroBatcher(fn, max_batch=2, window_ms=20)
    threads = []
    out = []
    for i in range(5):
        t = threading.Thread(target=lambda i=i: out.append(b.submit(i)))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    b.close()
    assert sorted(out) == [0, 1, 2, 3, 4]


def test_error_propagates_to_all_waiters():
    def fn(items):
        raise RuntimeError("boom")

    b = MicroBatcher(fn, max_batch=4, window_ms=10)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit("x")
    b.close()


def test_result_count_mismatch_raises():
    b = MicroBatcher(lambda items: items[:-1] if len(items) > 1 else [], window_ms=1)
    with pytest.raises(RuntimeError, match="results"):
        b.submit(1)
    b.close()


def test_closed_batcher_rejects():
    b = MicroBatcher(lambda items: items)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)


class _FakeRuntime:
    def __init__(self):
        self.text_calls = 0
        self.clip_calls = 0

    def embed_text_batch(self, texts):
        self.text_calls += 1
        return np.arange(len(texts) * 4, dtype=np.float32).reshape(len(texts), 4)

    def embed_queries_for_images(self, queries):
        self.clip_calls += 1
        return np.ones((len(queries), 8), dtype=np.float32)


def test_query_embed_batcher_one_dispatch_per_tower():
    rt = _FakeRuntime()
    qb = QueryEmbedBatcher(rt, max_batch=8, window_ms=30)
    results = {}
    threads = [
        threading.Thread(target=lambda q=f"q{i}": results.update({q: qb.embed(q)}))
        for i in range(5)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    qb.close()
    assert len(results) == 5
    for v in results.values():
        assert v["text"].shape == (4,) and v["image"].shape == (8,)
    # coalescing means strictly fewer tower calls than requests
    assert rt.text_calls < 5 and rt.clip_calls == rt.text_calls
    assert qb.stats["items_seen"] == 5


def test_engine_batcher_gated_by_setting(tmp_path):
    from mmrag_tpu.rag.engine import RagEngine
    from mmrag_tpu.settings import load_settings

    env = {
        "DATA_DIR": str(tmp_path),
        "TPU_MICROBATCH_WINDOW_MS": "0",
    }
    cfg = load_settings({**env})
    eng = RagEngine(cfg, runtime=_EngineRuntimeStub())
    assert eng.query_batcher is None
    eng.close()

    cfg2 = load_settings({**env, "TPU_MICROBATCH_WINDOW_MS": "2"})
    eng2 = RagEngine(cfg2, runtime=_EngineRuntimeStub())
    b = eng2.query_batcher
    assert b is not None and eng2.query_batcher is b  # cached
    eng2.close()


class _EngineRuntimeStub(_FakeRuntime):
    text_dim = 4
    clip_dim = 8


def test_pipelined_workers_overlap_batches():
    """workers=2: a second batch runs while the first is still blocked (the
    continuous-batching pipeline behind TPU_MICROBATCH_WORKERS)."""

    active = []
    peak = []
    lock = threading.Lock()

    def fn(items):
        with lock:
            active.append(1)
            peak.append(sum(active))
        time.sleep(0.05)
        with lock:
            active.pop()
        return [x * 2 for x in items]

    b = MicroBatcher(fn, max_batch=2, window_ms=1, workers=2)
    results = {}

    def worker(i):
        results[i] = b.submit(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert results == {i: i * 2 for i in range(8)}
    assert max(peak) == 2  # two batches genuinely in flight at once


def test_pipelined_workers_fold_arrivals_when_saturated():
    """With every runner busy, later arrivals coalesce into the pending batch
    instead of forming size-1 batches behind the pool."""

    def fn(items):
        time.sleep(0.05)
        return list(items)

    b = MicroBatcher(fn, max_batch=16, window_ms=1, workers=1 + 1)
    results = {}

    def worker(i):
        # first two arrive together (occupy both runners); the rest trickle
        # in while the pool is saturated and must fold into one batch
        if i >= 2:
            time.sleep(0.01 + i * 0.002)
        results[i] = b.submit(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert results == {i: i for i in range(10)}
    # 10 items should take far fewer than 10 batches
    assert b.batches_run <= 5, dict(b.batch_sizes)
