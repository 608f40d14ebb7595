"""Tracing / profiling utilities (SURVEY.md §5 — absent in the reference,
which has only tqdm progress bars; first-class here).

  * `trace(logdir)` — context manager around jax.profiler traces (open the
    result in TensorBoard / Perfetto).
  * `annotate(name)` — TraceAnnotation for labelling train-step phases.
  * `StageTimer` — wall-clock per-stage timing with device sync, used by the
    benchmark harness for stage breakdowns.
  * `nan_guard()` — enable jax debug-nans, mirroring the reference's
    finite-loss guard (train_thermal_dustr.py:320) as a debugging mode.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def nan_guard():
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StageTimer:
    """Accumulates wall-clock per named stage; `stage()` blocks on the given
    arrays at exit so device work is attributed to the right stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, *sync_arrays):
        t0 = time.perf_counter()
        yield
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)
