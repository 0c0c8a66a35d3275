"""Verbosity levels mirroring the reference's debug.h (QUIET..TRACE).

Reference: src/debug.h:1-5 defines int levels QUIET=0, INFO=1, DEBUG=2,
TRACE=3 selected by --debug/--trace CLI flags (src/main.cpp:457-465).
Here the same four levels map onto Python logging.
"""

from __future__ import annotations

import logging
import sys

QUIET = 0
INFO = 1
DEBUG = 2
TRACE = 3

_LEVEL_TO_LOGGING = {
    QUIET: logging.ERROR,
    INFO: logging.INFO,
    DEBUG: logging.DEBUG,
    TRACE: logging.DEBUG - 5,
}

_level = INFO

logging.addLevelName(logging.DEBUG - 5, "TRACE")


def get_logger(name: str = "esctp1raytracer_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers and name == "esctp1raytracer_tpu":
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("%(levelname)s %(name)s: %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(_LEVEL_TO_LOGGING[_level])
        logger.propagate = False
    return logger


def set_level(level: int) -> None:
    """Set global verbosity with a reference-style int level (0..3)."""
    global _level
    _level = max(QUIET, min(TRACE, int(level)))
    get_logger().setLevel(_LEVEL_TO_LOGGING[_level])


def current_level() -> int:
    return _level
