"""Minimal structured logger.

The reference uses ``loguru`` for lifecycle logging (e.g. ``src/train.py:51``,
``src/evaluation.py:74``). loguru is not available in this environment, so this
module provides a tiny compatible surface (``logger.info/.warning/.error``)
on top of the stdlib, with the same timestamped single-line format.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s - %(message)s"


def _build_logger() -> logging.Logger:
    log = logging.getLogger("svos")
    if not log.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        log.addHandler(handler)
        log.setLevel(logging.INFO)
        log.propagate = False
    return log


logger = _build_logger()
