"""Tracing & profiling hooks (the reference has none — SURVEY.md §5
notes only wall-clock prints, ref main.py:46,79-80).

``trace(dir)`` wraps a block in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``StageTimer`` collects named wall-clock stages and
can dump them as JSON.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stage timing with JSON export."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "calls": self.counts[k],
                    "mean_s": round(v / self.counts[k], 4)}
                for k, v in self.totals.items()}

    def dump(self, path: str) -> str:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
        return path


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
