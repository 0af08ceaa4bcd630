"""Tracing / profiling utilities.

The reference has three hand-rolled timing mechanisms (SURVEY.md §5.1):
MetricLogger iter/data timing, evaluate()'s model/evaluator timing with
explicit cuda synchronize, and cost_analyzer's latency summaries.  The first
two live in utils/logging.py and runners/common.py; this module adds the
TPU-native layer the reference lacks: XLA profiler traces viewable in
TensorBoard/Perfetto, named trace annotations, and a step timer that forces
a host sync (the TPU analog of cuda.synchronize — on tunneled backends a
scalar device->host read is the only reliable fence).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA profiler trace into ``log_dir`` (no-op when None).

    View with TensorBoard's profile plugin or Perfetto.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def sync(x) -> None:
    """Reliable device fence: force a scalar host read.

    ``block_until_ready`` alone under-reports on tunneled single-chip
    backends (see BASELINE.md round-1 findings); reducing to a scalar and
    pulling it to host provably waits for execution.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


class StepTimer:
    """Per-step wall-clock accumulator with compile-step exclusion."""

    def __init__(self, skip_first: int = 1):
        self.times = []
        self.skip_first = skip_first
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            sync(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        arr = np.asarray(self.times[self.skip_first:] or self.times)
        return {"mean_s": float(arr.mean()), "std_s": float(arr.std()),
                "steps": int(arr.size)}
