"""Structured jsonl metric logging.

The reference only ever ``print()``s loss values (``run.py:225-240``); here
every record is a machine-readable jsonl line with a wall-clock timestamp,
so runs are comparable and plottable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class JsonlLogger:
    def __init__(self, path: str):
        self.path = path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        self._fh = open(path, "a", buffering=1)

    def log(self, record: dict) -> None:
        rec = dict(record)
        rec.setdefault("ts", time.time())
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()


class StepTimer:
    """Accumulating wall-clock timer (the reference's ``total_time``
    pattern, ``run.py:144-146``), plus steps/s."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)
