"""Aux subsystems: KV TTL store, checkpointing (orbax + index snapshots),
metrics/stage profiling, /metrics endpoint."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.storage.kv import KVStore
from mmrag_tpu.utils import checkpoint as ckpt
from mmrag_tpu.utils.profiling import Metrics, stage, metrics as global_metrics


def test_kv_roundtrip_and_ttl(tmp_path, monkeypatch):
    kv = KVStore(str(tmp_path / "kv.db"))
    kv.setex("a", None, "forever")
    kv.setex("b", 100.0, "temp")
    assert kv.get("a") == "forever" and kv.get("b") == "temp"
    t = time.time()
    monkeypatch.setattr(time, "time", lambda: t + 200)
    assert kv.get("b") is None
    assert kv.get("a") == "forever"
    kv.delete("a")
    assert kv.get("a") is None
    kv.close()


def test_kv_set_if_absent(tmp_path):
    kv = KVStore(str(tmp_path / "kv.db"))
    assert kv.set_if_absent("lock", 100, "first") is True
    assert kv.set_if_absent("lock", 100, "second") is False
    assert kv.get("lock") == "first"
    kv.close()


def test_kv_sweep(tmp_path, monkeypatch):
    kv = KVStore(str(tmp_path / "kv.db"))
    kv.setex("x", 10.0, "1")
    kv.setex("y", None, "2")
    t = time.time()
    monkeypatch.setattr(time, "time", lambda: t + 100)
    assert kv.sweep() == 1
    kv.close()


def test_orbax_train_state_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.int32(7),
    }
    path = ckpt.save_train_state(str(tmp_path / "ck"), 7, state)
    assert "step_00000007" in path
    assert ckpt.latest_step(str(tmp_path / "ck")) == 7
    restored = ckpt.restore_train_state(str(tmp_path / "ck"), state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7


def test_checkpoint_gc(tmp_path):
    state = {"x": jnp.ones(2)}
    for step in range(5):
        ckpt.save_train_state(str(tmp_path / "ck"), step, state, keep=2)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 4
    import os
    kept = [n for n in os.listdir(tmp_path / "ck") if n.startswith("step_")]
    assert len(kept) == 2


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.restore_train_state(str(tmp_path / "empty"), {"x": jnp.ones(1)})


def test_index_snapshot_roundtrip(tmp_path):
    from mmrag_tpu.index.store import VectorIndex
    from mmrag_tpu.storage import VectorRow

    idx_dir = tmp_path / "index"
    ck_dir = tmp_path / "ckpt"
    index = VectorIndex(dim=4, dtype="float32")
    index.upsert([VectorRow(chunk_id="c1", user_id="u", document_id="d",
                            modality="text", embedding=np.ones(4))])
    index.save(str(idx_dir), "text_collection")
    snap = ckpt.snapshot_indexes(str(idx_dir), str(ck_dir), label="test")
    assert ckpt.list_index_snapshots(str(ck_dir)) == [snap.split("/")[-1]]

    # wreck the live index, then restore
    (idx_dir / "text_collection.npz").write_bytes(b"garbage")
    restored = ckpt.restore_indexes(snap, str(idx_dir))
    assert "text_collection.npz" in restored
    reloaded = VectorIndex.load(str(idx_dir), "text_collection", dtype="float32")
    assert len(reloaded) == 1


def test_metrics_summary():
    m = Metrics()
    m.incr("requests")
    m.incr("requests", 2)
    for v in (0.010, 0.020, 0.030):
        m.observe("lat", v)
    s = m.summary()
    assert s["counters"]["requests"] == 3
    assert s["latency_ms"]["lat"]["count"] == 3
    assert 19.0 < s["latency_ms"]["lat"]["p50"] < 21.0


def test_stage_context_feeds_metrics():
    global_metrics.reset()
    with stage("unit-test-stage"):
        time.sleep(0.01)
    s = global_metrics.summary()
    assert s["counters"]["stage.unit-test-stage"] == 1
    assert s["latency_ms"]["stage.unit-test-stage"]["p50"] >= 8.0
    global_metrics.reset()


def test_bench_child_step_smoke():
    """bench.py --step runs one benchmark in a child process and prints a
    parseable RESULT line (the driver's whole-bench record depends on it)."""

    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"),
         "--steps", "topk", "--quick", "--platform", "cpu"],
        capture_output=True, text=True, timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT topk ")]
    assert lines, proc.stdout
    value = json.loads(lines[0][len("RESULT topk "):])
    assert isinstance(value, float) and value > 0


def test_device_watchdog_state_machine():
    """ok -> wedged -> recovered transitions with injected probes; a stuck
    probe must not stack a second probe thread behind it."""

    import threading
    import time

    from mmrag_tpu.utils.watchdog import DeviceWatchdog
    from mmrag_tpu.utils.profiling import metrics

    metrics.reset()
    release = threading.Event()
    calls = []

    def probe():
        calls.append(time.monotonic())
        if len(calls) == 2:  # second probe wedges until released
            release.wait(10)

    wd = DeviceWatchdog(period_sec=0.05, timeout_sec=0.2, probe=probe)
    try:
        wd._tick()
        assert wd.status()["device"] == "ok"
        assert wd.status()["last_ok_age_sec"] is not None

        wd._tick()  # probe hangs -> wedged after timeout
        assert wd.status()["device"] == "wedged"
        assert metrics.summary()["counters"]["device.watchdog.wedged"] == 1

        n_before = len(calls)
        wd._tick()  # stuck probe still alive: no new probe starts
        assert len(calls) == n_before
        assert wd.status()["device"] == "wedged"

        release.set()  # runtime "recovers"
        time.sleep(0.05)
        wd._tick()
        assert wd.status()["device"] == "ok"
        assert metrics.summary()["counters"]["device.watchdog.recovered"] == 1
    finally:
        release.set()


def test_watchdog_disabled_reports_unknown():
    from mmrag_tpu.utils import watchdog

    assert watchdog.start_watchdog(0) is None
    assert watchdog.status()["device"] == "unknown"


def test_stop_watchdog_clears_global():
    """Server shutdown stops the process watchdog (its probe thread
    dispatches device ops — a daemon thread inside XLA at interpreter
    teardown aborts the process) and clears the singleton so a later
    start_watchdog can re-arm."""

    from mmrag_tpu.utils import watchdog

    wd = watchdog.start_watchdog(60.0, timeout_sec=1.0)
    assert wd is not None and watchdog._watchdog is wd
    watchdog.stop_watchdog()
    assert watchdog._watchdog is None
    assert watchdog.status()["device"] == "unknown"
    watchdog.stop_watchdog()  # idempotent when already stopped
