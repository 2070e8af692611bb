"""Logging utilities (reference llava/utils.py:17-57 behavior): named
loggers with optional daily-rotated file output under LOGDIR."""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys

from tokenpacker_tpu.constants import LOGDIR

_handler = None


def build_logger(logger_name: str, logger_filename: str) -> logging.Logger:
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    root = logging.getLogger()
    if not root.handlers:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(formatter)
        root.addHandler(console)
        root.setLevel(logging.INFO)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    if _handler is None and os.environ.get("TOKENPACKER_LOG_TO_FILE", "0") == "1":
        os.makedirs(LOGDIR, exist_ok=True)
        filename = os.path.join(LOGDIR, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True, encoding="utf-8"
        )
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)
    return logger


def disable_torch_init():
    """Reference utils.py:93 parity shim — a no-op in the JAX framework
    (kept so ported scripts don't break)."""
