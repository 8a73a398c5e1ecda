"""Structured run logger.

Compact replacement for the vendored OpenAI-baselines logger
(osmosis_utils/logger.py): text lines go to stdout + <dir>/log.txt, and
key-value rows accumulate into <dir>/progress.csv + progress.json. The
`configure(dir)` / `log()` / `logkv()+dumpkvs()` call surface is preserved;
MPI-rank plumbing is intentionally dropped (never exercised by the
reference's entry points — SURVEY.md section 2.7).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, dir: Optional[str] = None):
        self.dir = dir
        self._file = None
        self._kv: Dict[str, Any] = {}
        self._csv_keys = None
        if dir is not None:
            os.makedirs(dir, exist_ok=True)
            self._file = open(os.path.join(dir, "log.txt"), "a")

    def log(self, *args):
        msg = " ".join(str(a) for a in args)
        print(msg)
        if self._file:
            self._file.write(msg + "\n")
            self._file.flush()

    def logkv(self, key: str, value: Any):
        self._kv[key] = value

    def dumpkvs(self):
        if not self._kv or self.dir is None:
            self._kv = {}
            return
        row = dict(self._kv, _time=time.time())
        with open(os.path.join(self.dir, "progress.json"), "a") as f:
            f.write(json.dumps(row, default=str) + "\n")
        csv_path = os.path.join(self.dir, "progress.csv")
        if self._csv_keys is None:
            self._csv_keys = list(row)
            with open(csv_path, "a") as f:
                f.write(",".join(self._csv_keys) + "\n")
        with open(csv_path, "a") as f:
            f.write(",".join(str(row.get(k, "")) for k in self._csv_keys) + "\n")
        self._kv = {}

    def close(self):
        if self._file:
            self._file.close()
            self._file = None


_CURRENT: Optional[RunLogger] = None


def configure(dir: Optional[str] = None) -> RunLogger:
    global _CURRENT
    _CURRENT = RunLogger(dir)
    return _CURRENT


def get_current() -> RunLogger:
    global _CURRENT
    if _CURRENT is None:
        _CURRENT = RunLogger(None)
    return _CURRENT


def log(*args):
    get_current().log(*args)
