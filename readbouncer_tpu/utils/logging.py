"""Rotating-file loggers, one per subsystem.

Mirror of the reference's spdlog setup (5 MB rotating files, level
debug, one logger per subsystem: ReadBouncerLog / IbfLog / ClassifyLog /
RUClientLog; src/main/main.cpp:85-105, src/IBF/IBF.hpp:119-135,
src/IBF/IBFConfig.hpp:26-39, src/minknow/ReadUntilClient.cpp:45-56).
"""

from __future__ import annotations

import logging
from logging.handlers import RotatingFileHandler
from pathlib import Path

__all__ = ["setup_loggers", "get_logger"]

_SUBSYSTEMS = ("ReadBouncerLog", "IbfLog", "ClassifyLog", "RUClientLog")
_MAX_BYTES = 5 * 1024 * 1024
_BACKUPS = 10


def setup_loggers(log_dir: str | Path) -> None:
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    fmt = logging.Formatter(
        "[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s"
    )
    for name in _SUBSYSTEMS:
        logger = logging.getLogger(name)
        logger.setLevel(logging.DEBUG)
        if not logger.handlers:
            h = RotatingFileHandler(
                log_dir / f"{name}.txt", maxBytes=_MAX_BYTES, backupCount=_BACKUPS
            )
            h.setFormatter(fmt)
            logger.addHandler(h)
        logger.propagate = False


def get_logger(name: str = "ReadBouncerLog") -> logging.Logger:
    return logging.getLogger(name)
