"""Logging: console + rotating file targets with runtime-adjustable level.

Port of the reference's log setup (`src-tauri/src/lib.rs:50-86,371-395`):
a console target filtered by an env spec (RUST_LOG equivalent:
SPITTLE_LOG), a file target whose level is adjustable at runtime from
settings/UI (the reference's AtomicU8), and 500 KB rotation keeping one
backup (KeepOne).
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import threading
from typing import Optional

from spittle_tpu.config.settings import LogLevel

FILE_MAX_BYTES = 500_000
FILE_BACKUPS = 1

_LEVELS = {
    LogLevel.TRACE: 5,
    LogLevel.DEBUG: logging.DEBUG,
    LogLevel.INFO: logging.INFO,
    LogLevel.WARN: logging.WARNING,
    LogLevel.ERROR: logging.ERROR,
}

logging.addLevelName(5, "TRACE")


class _RuntimeLevelFilter(logging.Filter):
    """The runtime-adjustable file level (AtomicU8 analog)."""

    def __init__(self):
        super().__init__()
        self._level = logging.DEBUG
        self._lock = threading.Lock()

    def set_level(self, level: int) -> None:
        with self._lock:
            self._level = level

    def filter(self, record: logging.LogRecord) -> bool:
        with self._lock:
            return record.levelno >= self._level


class LogSystem:
    def __init__(self, log_dir: str, console_env: str = "SPITTLE_LOG"):
        os.makedirs(log_dir, exist_ok=True)
        self.logger = logging.getLogger("spittle_tpu")
        self.logger.setLevel(5)
        self.logger.propagate = False
        self.logger.handlers.clear()

        console = logging.StreamHandler()
        env_level = os.environ.get(console_env, "info").upper()
        console.setLevel(
            5 if env_level == "TRACE" else
            getattr(logging, env_level, logging.INFO)
        )
        console.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        self.logger.addHandler(console)

        self.log_path = os.path.join(log_dir, "spittle_tpu.log")
        file_handler = logging.handlers.RotatingFileHandler(
            self.log_path, maxBytes=FILE_MAX_BYTES, backupCount=FILE_BACKUPS
        )
        file_handler.setLevel(5)
        file_handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        self._file_filter = _RuntimeLevelFilter()
        file_handler.addFilter(self._file_filter)
        self.logger.addHandler(file_handler)

    def set_file_level(self, level: LogLevel) -> None:
        """Runtime file-level adjustment (set_log_level command)."""
        self._file_filter.set_level(_LEVELS[level])


_system: Optional[LogSystem] = None


def init_logging(log_dir: str) -> LogSystem:
    global _system
    _system = LogSystem(log_dir)
    return _system


def get_logger(name: str = "") -> logging.Logger:
    base = logging.getLogger("spittle_tpu")
    return base.getChild(name) if name else base
