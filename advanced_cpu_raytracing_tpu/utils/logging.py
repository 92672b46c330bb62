"""Structured logging (replaces the reference's bare std::cout prints,
SURVEY.md section 5)."""

from __future__ import annotations

import logging
import os

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "acrt") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, "%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("ACRT_LOG_LEVEL", "INFO").upper())
        logger.propagate = False
    return logger
