"""Logger setup (reference utils/log_utils.py:8-32 equivalent)."""

from __future__ import annotations

import logging
import sys
from typing import Optional


def init_logger(
    log_file: Optional[str] = None,
    name: str = "crfconv_tpu",
    level: int = logging.INFO,
) -> logging.Logger:
    """File + console logger."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    if not any(
        isinstance(h, logging.StreamHandler) for h in logger.handlers
    ):
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler) for h in logger.handlers
    ):
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
