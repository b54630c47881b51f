"""Tracing and step timing.

The reference has no profiling at all (SURVEY §5: only tqdm bars and
wall-clock bookkeeping, trainer.py:139-152); here tracing is first-class:
``trace()`` wraps ``jax.profiler`` for TensorBoard-viewable device traces,
and ``StepTimer`` collects per-phase wall-time statistics for the training
and fitting loops.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir, enabled=True):
    """Device+host trace to ``logdir`` (view with TensorBoard's profile
    plugin or xprof). No-op when disabled or the profiler is unavailable."""
    if not enabled or logdir is None:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    try:
        jax.profiler.start_trace(logdir)
    except Exception as e:  # pragma: no cover - backend without profiler
        print(f"WARNING: profiler unavailable ({e}); tracing disabled")
        yield
        return
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up on the device trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock accumulator keyed by phase name.

    with timer.phase("encode"): ...
    timer.summary() -> {phase: {count, total_s, mean_ms, max_ms}}
    """

    def __init__(self):
        self._acc = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self):
        out = {}
        for name, ts in self._acc.items():
            out[name] = {
                "count": len(ts),
                "total_s": round(sum(ts), 4),
                "mean_ms": round(1e3 * sum(ts) / len(ts), 3),
                "max_ms": round(1e3 * max(ts), 3),
            }
        return out

    def report(self, path=None):
        s = self.summary()
        if path:
            with open(path, "w") as f:
                json.dump(s, f, indent=2)
        return s
