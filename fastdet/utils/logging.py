"""Structured metrics logging: console + JSONL event file.

The reference logs only through tqdm description strings
(train.py:127-129); here every step/eval metric is also appended to a
JSONL file so runs are machine-readable (and TensorBoard-convertible).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None, run_name: str = "run"):
        self._fh = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            path = os.path.join(logdir, f"{run_name}.jsonl")
            self._fh = open(path, "a")
            self.path = path

    def log(self, step: int, metrics: Dict[str, Any], kind: str = "train",
            echo: bool = False) -> None:
        rec = {"ts": time.time(), "step": int(step), "kind": kind}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if echo:
            parts = " ".join(f"{k}:{v:.6f}" if isinstance(v, float)
                             else f"{k}:{v}" for k, v in rec.items()
                             if k not in ("ts", "kind"))
            print(parts, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
