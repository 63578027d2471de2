"""Tracing + stage timing: request ids, stage events, jax.profiler hooks.

Extends the reference's observability (request-id logging middleware
``/root/reference/app/main.py:30-41`` + Celery ``update_state`` stage events,
SURVEY §5 "add jax.profiler trace hooks + per-stage timing in the same
stage-event shape"):

  * :func:`stage` — context manager logging ``stage=<name> ms=<t>`` and
    feeding an in-process metrics registry;
  * :class:`Metrics` — lock-protected counters + latency reservoirs with
    p50/p95 summaries (exposed by the HTTP layer);
  * :func:`device_trace` — wraps a block in ``jax.profiler`` trace capture
    when ``TPU_PROFILE_DIR`` is set (XPlane dumps viewable in TensorBoard /
    xprof), no-op otherwise.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional

logger = logging.getLogger("mmrag_tpu.stage")


class Metrics:
    def __init__(self, reservoir: int = 512) -> None:
        self._lock = threading.Lock()
        self._counters: Dict[str, int] = defaultdict(int)
        self._gauges: Dict[str, float] = {}
        self._latencies: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=reservoir)
        )

    def incr(self, name: str, amount: int = 1) -> None:
        with self._lock:
            self._counters[name] += amount

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            self._latencies[name].append(seconds)

    def gauge(self, name: str, value: float) -> None:
        """Last-value-wins statistic in its OWN unit (quality scores,
        sizes) — ``observe`` is for durations only: its reservoir exports
        as a ``*_latency_ms`` summary multiplied by 1e3, which renders a
        0.83 reconstruction cosine as "830 ms" (review finding)."""

        with self._lock:
            self._gauges[name] = float(value)

    def summary(self) -> Dict:
        with self._lock:
            out: Dict = {
                "counters": dict(self._counters),
                "gauges": dict(self._gauges),
                "latency_ms": {},
            }
            for name, values in self._latencies.items():
                if not values:
                    continue
                ordered = sorted(values)
                out["latency_ms"][name] = {
                    "count": len(ordered),
                    "p50": round(ordered[len(ordered) // 2] * 1e3, 3),
                    "p95": round(ordered[int(len(ordered) * 0.95)] * 1e3, 3),
                    "max": round(ordered[-1] * 1e3, 3),
                }
            return out

    def prometheus_text(self) -> str:
        """The summary in Prometheus text exposition format (v0.0.4).

        Counter names map to ``mmrag_<name>_total`` and each latency
        reservoir to a ``mmrag_<name>_latency_ms`` summary (p50/p95
        quantiles + count + max), so a stock Prometheus scrape of
        ``/metrics?format=prometheus`` works without an exporter sidecar.
        Dots and other non-metric characters in registry names become
        underscores per the exposition grammar.
        """

        def _name(raw: str) -> str:
            cleaned = [
                ch if (ch.isalnum() or ch == "_") else "_" for ch in raw
            ]
            if cleaned and cleaned[0].isdigit():
                cleaned.insert(0, "_")
            return "".join(cleaned)

        summary = self.summary()
        lines = []
        for raw, value in sorted(summary["counters"].items()):
            metric = f"mmrag_{_name(raw)}_total"
            lines.append(f"# TYPE {metric} counter")
            lines.append(f"{metric} {value}")
        for raw, value in sorted(summary["gauges"].items()):
            metric = f"mmrag_{_name(raw)}"
            lines.append(f"# TYPE {metric} gauge")
            lines.append(f"{metric} {value}")
        for raw, stats in sorted(summary["latency_ms"].items()):
            metric = f"mmrag_{_name(raw)}_latency_ms"
            lines.append(f"# TYPE {metric} summary")
            lines.append(f'{metric}{{quantile="0.5"}} {stats["p50"]}')
            lines.append(f'{metric}{{quantile="0.95"}} {stats["p95"]}')
            lines.append(f"{metric}_count {stats['count']}")
            lines.append(f"# TYPE {metric}_max gauge")
            lines.append(f"{metric}_max {stats['max']}")
        return "\n".join(lines) + "\n"

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._gauges.clear()
            self._latencies.clear()


metrics = Metrics()


@contextlib.contextmanager
def stage(name: str, request_id: str = "-") -> Iterator[None]:
    """Time a pipeline stage; logs in the reference's stage-event shape."""

    t0 = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - t0
        metrics.incr(f"stage.{name}")
        metrics.observe(f"stage.{name}", elapsed)
        logger.info("rid=%s stage=%s ms=%.1f", request_id, name, elapsed * 1e3)


@contextlib.contextmanager
def device_trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace capture when a profile dir is configured."""

    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", profile_dir)
