"""Profiling / tracing helpers (SURVEY.md §5: the reference has no tracer —
wall-clock loops + fvcore only). On TPU we expose jax.profiler traces and
compiled-program cost analysis as first-class utilities."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """XLA cost analysis of the jitted fn: flops, bytes accessed, memory."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # some backends return a singleton list
        cost = cost[0] if cost else {}
    mem = compiled.memory_analysis()
    out = {k: cost.get(k) for k in ("flops", "bytes accessed") if cost}
    if mem is not None:
        out["temp_size_bytes"] = getattr(mem, "temp_size_in_bytes", None)
        out["argument_size_bytes"] = getattr(mem, "argument_size_in_bytes", None)
    return out


class StepTimer:
    """Rolling wall-clock step timer with p50/p90 summary."""

    def __init__(self):
        self.samples = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "p50_s": s[n // 2],
            "p90_s": s[min(int(0.9 * n), n - 1)],
            "mean_s": sum(s) / n,
            "steps": float(n),
        }
