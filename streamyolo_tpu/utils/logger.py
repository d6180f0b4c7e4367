"""Logging setup (stdlib logging; capability parity with the reference's
loguru usage + ``setup_logger`` file sinks, `double_trainer.py:67-72`)."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGER_NAME = "streamyolo_tpu"
_FORMAT = "%(asctime)s | %(levelname)s | %(name)s:%(lineno)d - %(message)s"


def get_logger(name: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME if name is None else f"{_LOGGER_NAME}.{name}")
    root = logging.getLogger(_LOGGER_NAME)
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(handler)
        root.setLevel(logging.INFO)
    return logger


def setup_logger(
    save_dir: str,
    distributed_rank: int = 0,
    filename: str = "log.txt",
    mode: str = "a",
) -> logging.Logger:
    """Add a per-run file sink; only rank 0 writes (reference
    ``setup_logger`` contract, SURVEY.md §2.3)."""
    logger = get_logger()
    root = logging.getLogger(_LOGGER_NAME)
    if distributed_rank == 0:
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, filename)
        if not any(
            isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(path)
            for h in root.handlers
        ):
            fh = logging.FileHandler(path, mode=mode)
            fh.setFormatter(logging.Formatter(_FORMAT))
            root.addHandler(fh)
    return logger
