"""Lightweight tracing/profiling hooks (SURVEY section 5: the reference has
none beyond wall-clock prints).

Set TOPAZ_PROFILE=/path/to/dir to capture a jax profiler trace around
pipeline stages; `stage(...)` always records wall-clock timings retrievable
via `timings()` and prints them to stderr when TOPAZ_TIMINGS=1.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict
from typing import Dict, Iterator

_timings: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Time a pipeline stage; nests with the jax profiler when enabled."""
    trace_dir = os.environ.get("TOPAZ_PROFILE")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    _timings[name].append(dt)
    if os.environ.get("TOPAZ_TIMINGS"):
        print(f"# [timing] {name}: {dt * 1e3:.1f} ms", file=sys.stderr)


@contextlib.contextmanager
def profile_session() -> Iterator[None]:
    """Wrap a whole run in a jax profiler trace when TOPAZ_PROFILE is set."""
    trace_dir = os.environ.get("TOPAZ_PROFILE")
    if not trace_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"# profiler trace written to {trace_dir}", file=sys.stderr)


def timings() -> Dict[str, Dict[str, float]]:
    return {
        name: {"count": len(ts), "total_s": sum(ts),
               "mean_ms": 1e3 * sum(ts) / len(ts)}
        for name, ts in _timings.items()
    }


def reset() -> None:
    _timings.clear()
