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


def flops_estimate(fn, *args, **kwargs):
    """Analytic matmul/conv FLOP count of ``fn(*args)`` from its jaxpr.

    Counts 2*MACs for ``dot_general`` and ``conv_general_dilated`` (the ops
    that land on the MXU and dominate every workload here), recursing into
    call/control-flow sub-jaxprs (scan bodies multiply by trip count).
    Elementwise/reduction VPU work is excluded by design -- this feeds MFU
    figures, which convention defines over matmul FLOPs. Works on any
    backend, unlike compiled-executable cost_analysis (unavailable through
    remote-tunnel platforms)."""
    import jax
    from jax._src import core as jcore

    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)

    def size(shape):
        n = 1
        for s in shape:
            n *= int(s)
        return n

    def eqn_flops(eqn):
        name = eqn.primitive.name
        if name == "dot_general":
            (lc, _), _ = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            k = 1
            for d in lc:
                k *= int(lhs[d])
            return 2.0 * size(eqn.outvars[0].aval.shape) * k
        if name == "conv_general_dilated":
            rhs = eqn.invars[1].aval.shape  # kernel
            dn = eqn.params["dimension_numbers"]
            groups = int(eqn.params.get("feature_group_count", 1))
            # MACs per output element = C_in_per_group * prod(kernel spatial)
            per_out = int(rhs[dn.rhs_spec[1]])
            for d in dn.rhs_spec[2:]:
                per_out *= int(rhs[d])
            del groups  # rhs C_in dim is already per-group
            return 2.0 * size(eqn.outvars[0].aval.shape) * per_out
        total = 0.0
        for pname, p in eqn.params.items():
            sub = None
            if isinstance(p, jcore.ClosedJaxpr):
                sub = p.jaxpr
            elif isinstance(p, jcore.Jaxpr):
                sub = p
            elif pname == "branches":  # cond: count the worst branch
                return max(jaxpr_flops(b.jaxpr) for b in p)
            if sub is not None:
                f = jaxpr_flops(sub)
                if name == "scan":
                    f *= int(eqn.params.get("length", 1))
                total += f
        return total

    def jaxpr_flops(jx):
        return sum(eqn_flops(e) for e in jx.eqns)

    return jaxpr_flops(jaxpr.jaxpr)


class StepTimer:
    """Wall-clock accumulator keyed by phase name.

    with timer.phase("encode"): ...
    timer.summary() -> {phase: {count, total_s, mean_ms, max_ms}}
    """

    def __init__(self):
        self._acc = defaultdict(list)

    def reset(self):
        self._acc.clear()

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
