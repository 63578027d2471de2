"""SQLite store for per-video study notes and quizzes.

Contract matches the reference ``NoteStore``
(``/root/reference/app/storage/note_store.py:11-120``): a ``video_notes``
table keyed ``(user_id, video_id)`` holding one JSON payload
``{summary, key_points, timeline, quiz}``, with upsert / list / get / quiz
accessors. Thread-safe (single locked connection, WAL).
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
import time
from typing import Any, Dict, List, Optional


class NoteStore:
    def __init__(self, db_path: str) -> None:
        directory = os.path.dirname(os.path.abspath(db_path))
        os.makedirs(directory, exist_ok=True)
        self._lock = threading.RLock()
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._conn.execute("PRAGMA journal_mode=WAL")
        with self._lock, self._conn:
            self._conn.execute(
                """
                CREATE TABLE IF NOT EXISTS video_notes (
                    user_id TEXT NOT NULL,
                    video_id TEXT NOT NULL,
                    title TEXT NOT NULL DEFAULT '',
                    payload TEXT NOT NULL,
                    updated_at REAL NOT NULL,
                    PRIMARY KEY (user_id, video_id)
                )
                """
            )

    def upsert(
        self, user_id: str, video_id: str, payload: Dict[str, Any], title: str = ""
    ) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                """
                INSERT INTO video_notes (user_id, video_id, title, payload, updated_at)
                VALUES (?, ?, ?, ?, ?)
                ON CONFLICT(user_id, video_id) DO UPDATE SET
                    title=excluded.title,
                    payload=excluded.payload,
                    updated_at=excluded.updated_at
                """,
                (user_id, video_id, title, json.dumps(payload, sort_keys=True), time.time()),
            )

    def list_videos(self, user_id: str) -> List[Dict[str, Any]]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT video_id, title, updated_at FROM video_notes "
                "WHERE user_id=? ORDER BY updated_at DESC",
                (user_id,),
            ).fetchall()
        return [{"video_id": r[0], "title": r[1], "updated_at": r[2]} for r in rows]

    def get_video(self, user_id: str, video_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            row = self._conn.execute(
                "SELECT title, payload, updated_at FROM video_notes "
                "WHERE user_id=? AND video_id=?",
                (user_id, video_id),
            ).fetchone()
        if row is None:
            return None
        payload = json.loads(row[1])
        payload.setdefault("title", row[0])
        payload["updated_at"] = row[2]
        payload["video_id"] = video_id
        return payload

    def get_quiz(self, user_id: str, video_id: str) -> Optional[List[Dict[str, Any]]]:
        notes = self.get_video(user_id, video_id)
        if notes is None:
            return None
        quiz = notes.get("quiz")
        return quiz if isinstance(quiz, list) else []

    def close(self) -> None:
        with self._lock:
            self._conn.close()
