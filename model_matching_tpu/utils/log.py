"""Structured logging for the framework.

The reference logs with raw std::cout and has no levels or structure
(SURVEY.md section 5: sizes at stocs.cpp:96,970, phase timings at
stocs_match_one_object.cpp:103-164). Here every subsystem logs through one
namespaced logger with levels, and machine-readable events can be emitted
as single JSON lines for harness consumption.

Environment:
  MM_TPU_LOG       — level name (DEBUG/INFO/WARNING/ERROR); default INFO.
  MM_TPU_LOG_JSON  — when set to 1, log_event() lines are pure JSON
                     (no prefix), one object per line.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

_LOGGER_NAME = "model_matching_tpu"
_configured = False


def get_logger(name: str = _LOGGER_NAME) -> logging.Logger:
    """The package logger, configured once from MM_TPU_LOG."""
    global _configured
    logger = logging.getLogger(_LOGGER_NAME)
    if not _configured:
        level = os.environ.get("MM_TPU_LOG", "INFO").upper()
        logger.setLevel(getattr(logging, level, logging.INFO))
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[mm-tpu] %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.propagate = False
        _configured = True
    if name != _LOGGER_NAME:
        return logger.getChild(name.removeprefix(_LOGGER_NAME + "."))
    return logger


def log_event(event: str, **fields) -> None:
    """Emit one structured machine-readable record.

    With MM_TPU_LOG_JSON=1 the line is a bare JSON object (for harnesses
    that scrape stdout); otherwise it goes through the logger at INFO."""
    record = {"event": event, "ts": round(time.time(), 3), **fields}
    line = json.dumps(record, sort_keys=False, default=float)
    if os.environ.get("MM_TPU_LOG_JSON") == "1":
        print(line, flush=True)
    else:
        get_logger().info(line)


def warn(msg: str, **fields) -> None:
    """Level-WARNING message with optional structured fields appended."""
    if fields:
        msg = msg + " " + json.dumps(fields, default=float)
    get_logger().warning(msg)
