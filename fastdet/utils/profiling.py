"""Tracing / profiling / model summary.

The reference has only ad-hoc wall timers (test.py:41-45) and a
torchsummary table at startup (train.py:71).  Here:
  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable device trace
  * `StepTimer` — wall-clock step timing with percentile summaries
  * `summarize_model` — parameter/shape table for any Flax module
    (the torchsummary counterpart)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; reports p50/p90/mean."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {"steps": len(t), "mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p90_ms": float(np.percentile(t, 90) * 1e3)}


def summarize_model(model, variables: dict, input_shape=(1, 352, 352, 3)
                    ) -> str:
    """Parameter/shape table (the torchsummary counterpart)."""
    import jax

    lines = ["-" * 64,
             f"{'Param':<44}{'Shape':<14}{'Count':>6}",
             "=" * 64]
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params", {}))[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        lines.append(f"{name:<44}{str(tuple(leaf.shape)):<14}{n:>6}")
    stats = jax.tree.leaves(variables.get("batch_stats", {}))
    n_stats = sum(int(np.prod(s.shape)) for s in stats)
    lines.append("=" * 64)
    lines.append(f"Trainable params: {total:,}")
    lines.append(f"BatchNorm stats:  {n_stats:,}")
    lines.append(f"Total:            {total + n_stats:,}")
    lines.append(f"Input shape:      {tuple(input_shape)}")
    lines.append("-" * 64)
    return "\n".join(lines)
