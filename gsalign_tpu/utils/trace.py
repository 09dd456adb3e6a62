"""Tracing / profiling subsystem.

The reference's only observability is stderr progress lines and wall-clock
seconds (src/GSAlign.cpp:482-550, src/main.cpp:301). Here:

- ``StageTimer`` collects per-stage wall times for every pipeline run; the
  driver attaches one to RunStats so callers (and bench tooling) can read a
  stage breakdown without re-instrumenting.
- ``device_trace`` wraps ``jax.profiler`` so a run can be captured for
  TensorBoard/XProf with GSALIGN_TRACE=<dir> or the context manager.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        import threading
        self.totals: Dict[str, float] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str):
        """Accumulate wall time for a stage. Thread-safe: the parallel
        per-chromosome pass times its stages from worker threads, so
        overlapping stages may sum to more than the wall clock."""
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            with self._lock:
                self.totals[name] = self.totals.get(name, 0.0) + dt

    def report(self) -> str:
        total = sum(self.totals.values())
        parts = " ".join(f"{k}={v:.2f}s" for k, v in self.totals.items())
        return f"{parts} total={total:.2f}s"


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None):
    """Capture a jax.profiler trace when a directory is given (or the
    GSALIGN_TRACE env var is set). No-op otherwise."""
    trace_dir = trace_dir or os.environ.get("GSALIGN_TRACE")
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
