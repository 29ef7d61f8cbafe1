"""Logging utilities.

Behavioral parity with reference ``src/utils/logger.py:11-50``: a named
stdlib logger with a console INFO handler and an optional file DEBUG
handler, timestamped format. Additionally tags records with the JAX
process index so multi-host runs interleave legibly.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import Optional

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def setup_logger(
    name: str,
    log_file: Optional[str] = None,
    level: int = logging.INFO,
    console_output: bool = True,
) -> logging.Logger:
    """Create (or fetch) a logger with console + optional file handlers."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    # Idempotent: reconfigure instead of stacking handlers.
    for h in list(logger.handlers):
        logger.removeHandler(h)

    formatter = logging.Formatter(_FORMAT)

    if console_output:
        ch = logging.StreamHandler(sys.stdout)
        ch.setLevel(level)
        ch.setFormatter(formatter)
        logger.addHandler(ch)

    if log_file is not None:
        path = Path(log_file)
        path.parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(path)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    return logger


def process_index() -> int:
    """JAX process index without forcing backend init at import time."""
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", "0"))
