"""Logging + scalar tracking.

Parity: alphapose/opt.py:65-86 (file+stream logger with epochInfo) and
alphapose/utils/logger.py:10-29 (tensorboard scalar/image writing —
tensorboardX is unavailable here; scalars go to a JSONL ring the analysis
scripts read, images to PNG dumps).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


def make_logger(name: str, work_dir: Optional[str] = None,
                filename: str = "train.log") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(work_dir, filename))
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    def epoch_info(epoch, loss, acc):
        logger.info(f"Epoch {epoch} | loss:{loss:.8f} | acc:{acc:.4f}")

    logger.epochInfo = epoch_info  # type: ignore[attr-defined]
    return logger


class ScalarWriter:
    """board_writing equivalent: appends {step, tag, value, wall} JSONL."""

    def __init__(self, work_dir: str, filename: str = "scalars.jsonl"):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, filename)
        self._f = open(self.path, "a")

    def write(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"step": step, "tag": tag,
                                  "value": float(value),
                                  "wall": time.time()}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
