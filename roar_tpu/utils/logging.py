"""Process/host-aware logging.

Re-design of the reference's singleton logger
(roar/utils/roar_logging.py:23-400): a stdlib logger decorated with the JAX
process index (the multi-host "rank"), LogMode.ONCE-style dedup, and env-var
controlled level (ROAR_LOG_LEVEL).
"""

from __future__ import annotations

import logging
import os
import sys
from functools import lru_cache

_FORMAT = "[roar_tpu %(levelname)s %(process)s] %(message)s"


@lru_cache(maxsize=1)
def get_logger(name: str = "roar_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.propagate = False
    level = os.environ.get("ROAR_LOG_LEVEL", "INFO").upper()
    logger.setLevel(getattr(logging, level, logging.INFO))
    return logger


_seen: set = set()


def log_once(message: str, level: int = logging.INFO) -> None:
    """Log a message only once per process (LogMode.ONCE analogue)."""
    if message in _seen:
        return
    _seen.add(message)
    get_logger().log(level, message)


def process_index() -> int:
    """Multi-host process index (rank analogue); 0 when undistributed."""
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0
