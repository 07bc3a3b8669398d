"""History manager tests (reference: history.rs:497-572 + migrations)."""

import os
import sqlite3
import time

import numpy as np
import pytest

from spittle_tpu.config.settings import RecordingRetentionPeriod
from spittle_tpu.events import EventBus, HISTORY_UPDATED
from spittle_tpu.managers.history import HistoryManager


def make(tmp_path, retention=RecordingRetentionPeriod.PRESERVE_LIMIT, limit=5):
    return HistoryManager(
        str(tmp_path),
        events=EventBus(),
        retention_getter=lambda: retention,
        history_limit_getter=lambda: limit,
    )


def test_save_and_query(tmp_path):
    h = make(tmp_path)
    audio = np.zeros(16000, np.float32)
    eid = h.save_transcription(audio, "Test", "hello world")
    entries = h.get_history_entries()
    assert len(entries) == 1
    e = entries[0]
    assert e.id == eid
    assert e.transcription_text == "hello world"
    assert not e.saved
    assert os.path.exists(h.recording_path(e))


def test_events_emitted(tmp_path):
    bus = EventBus()
    got = []
    bus.listen(HISTORY_UPDATED, got.append)
    h = HistoryManager(str(tmp_path), events=bus)
    h.save_transcription(None, "t", "x")
    assert got


def test_toggle_saved(tmp_path):
    h = make(tmp_path)
    eid = h.save_transcription(None, "t", "x")
    assert h.toggle_saved_status(eid) is True
    assert h.get_history_entries()[0].saved
    assert h.toggle_saved_status(eid) is False
    assert h.toggle_saved_status(99999) is False


def test_delete_entry_removes_wav(tmp_path):
    h = make(tmp_path)
    eid = h.save_transcription(np.zeros(1600, np.float32), "t", "x")
    path = h.recording_path(h.get_history_entries()[0])
    assert os.path.exists(path)
    h.delete_entry(eid)
    assert not os.path.exists(path)
    assert h.get_history_entries() == []


def test_retention_preserve_limit(tmp_path):
    h = make(tmp_path, limit=3)
    for i in range(6):
        h.save_transcription(None, f"t{i}", f"text{i}", timestamp=1000 + i)
    entries = h.get_history_entries()
    assert len(entries) == 3
    assert [e.title for e in entries] == ["t5", "t4", "t3"]


def test_retention_keeps_saved(tmp_path):
    h = make(tmp_path, limit=2)
    first = h.save_transcription(None, "keep", "x", timestamp=100)
    h.toggle_saved_status(first)
    for i in range(4):
        h.save_transcription(None, f"t{i}", "y", timestamp=200 + i)
    titles = {e.title for e in h.get_history_entries()}
    assert "keep" in titles
    assert len(titles) == 3  # 2 unsaved newest + 1 saved


def test_retention_time_based(tmp_path):
    h = make(tmp_path, retention=RecordingRetentionPeriod.DAYS3)
    old_ts = int(time.time()) - 4 * 86400
    h.save_transcription(None, "old", "x", timestamp=old_ts)
    h.save_transcription(None, "new", "y")
    titles = [e.title for e in h.get_history_entries()]
    assert titles == ["new"]


def test_retention_never_deletes_unsaved(tmp_path):
    h = make(tmp_path, retention=RecordingRetentionPeriod.NEVER)
    h.save_transcription(None, "a", "x")
    assert h.get_history_entries() == []


def test_migrations_idempotent(tmp_path):
    h1 = make(tmp_path)
    h1.save_transcription(None, "t", "x")
    # Re-open over the same db: migrations must not re-run/destroy data
    h2 = make(tmp_path)
    assert len(h2.get_history_entries()) == 1


def test_legacy_sqlx_migration_conversion(tmp_path):
    db = str(tmp_path / "history.db")
    conn = sqlite3.connect(db)
    conn.executescript(
        """CREATE TABLE transcription_history (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            file_name TEXT NOT NULL,
            timestamp INTEGER NOT NULL,
            saved BOOLEAN NOT NULL DEFAULT 0,
            title TEXT NOT NULL,
            transcription_text TEXT NOT NULL,
            post_processed_text TEXT,
            post_process_prompt TEXT
        );
        CREATE TABLE _sqlx_migrations (version INTEGER, success INTEGER);
        INSERT INTO _sqlx_migrations VALUES (1, 1), (2, 1), (3, 1);
        INSERT INTO transcription_history
            (file_name, timestamp, saved, title, transcription_text)
            VALUES ('', 123, 0, 'legacy', 'old text');
        """
    )
    conn.commit()
    conn.close()
    h = make(tmp_path, retention=RecordingRetentionPeriod.PRESERVE_LIMIT)
    entries = h.get_history_entries()
    assert [e.title for e in entries] == ["legacy"]
    # user_version converted; _sqlx_migrations dropped
    conn = sqlite3.connect(db)
    assert conn.execute("PRAGMA user_version").fetchone()[0] == 3
    assert conn.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE name='_sqlx_migrations'"
    ).fetchone()[0] == 0
