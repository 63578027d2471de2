"""Per-user index version counters — the cache-invalidation backbone.

Same contract as the reference's JSON version file
(``/root/reference/app/ml/index_build.py:16-43``): every index write bumps the
owning user's version; retrieval/chat cache keys embed the version so stale
entries die on write. The reference's non-atomic read-modify-write across
processes (SURVEY §5 race list) is fixed here with SQLite's atomic upsert —
safe across threads AND processes.
"""

from __future__ import annotations

import os
import sqlite3
import threading


class IndexVersionStore:
    def __init__(self, path: str) -> None:
        directory = os.path.dirname(os.path.abspath(path))
        os.makedirs(directory, exist_ok=True)
        self._lock = threading.RLock()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute("PRAGMA journal_mode=WAL")
        with self._lock, self._conn:
            self._conn.execute(
                """
                CREATE TABLE IF NOT EXISTS index_versions (
                    user_id TEXT PRIMARY KEY,
                    version INTEGER NOT NULL DEFAULT 0
                )
                """
            )

    def get(self, user_id: str) -> int:
        with self._lock:
            row = self._conn.execute(
                "SELECT version FROM index_versions WHERE user_id=?", (user_id,)
            ).fetchone()
        return int(row[0]) if row else 0

    def bump(self, user_id: str) -> int:
        """Atomically increment and return the new version."""

        with self._lock, self._conn:
            self._conn.execute(
                """
                INSERT INTO index_versions (user_id, version) VALUES (?, 1)
                ON CONFLICT(user_id) DO UPDATE SET version = version + 1
                """,
                (user_id,),
            )
            row = self._conn.execute(
                "SELECT version FROM index_versions WHERE user_id=?", (user_id,)
            ).fetchone()
        return int(row[0])

    def close(self) -> None:
        with self._lock:
            self._conn.close()
