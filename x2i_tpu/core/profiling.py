"""First-class tracing/profiling (absent in the reference, SURVEY.md §5.1)."""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Dict, List, Optional

import jax

log = logging.getLogger("x2i_tpu")


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion and summary stats."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._n = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": float("nan"), "steps": 0}
        ts = sorted(self.times)
        return {
            "mean_s": sum(ts) / len(ts),
            "min_s": ts[0],
            "p50_s": ts[len(ts) // 2],
            "max_s": ts[-1],
            "steps": len(ts),
        }


def block_until_ready(tree):
    return jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, tree)
