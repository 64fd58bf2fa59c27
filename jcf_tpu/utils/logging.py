"""Structured logging + metric tracking.

The reference's live path logs with bare ``print`` (SURVEY.md §5); its
intended file+stream logger lives in dead torch code (``utils.py:119-138``).
This provides that capability properly: a namespaced stream/file logger and
a metric logger that both prints human-readable lines and appends JSONL for
machine consumption.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

_LOGGERS: Dict[str, logging.Logger] = {}


def get_logger(name: str = "jcf_tpu", log_file: Optional[str] = None) -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


class MetricLogger:
    """Named scalar metrics: human lines via the logger + JSONL sidecar."""

    def __init__(self, name: str = "jcf_tpu", jsonl_path: Optional[str] = None):
        self.logger = get_logger(name)
        self.jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)

    def log(self, step: int, **metrics: float) -> None:
        line = " ".join(f"{k}={float(v):.6g}" for k, v in metrics.items())
        self.logger.info("step=%d %s", step, line)
        if self.jsonl_path:
            record = {"step": step, "time": time.time()}
            record.update({k: float(v) for k, v in metrics.items()})
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
