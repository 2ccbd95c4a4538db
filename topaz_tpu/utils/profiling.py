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


def timing_enabled() -> bool:
    """True when per-stage numbers are being reported or traced."""
    return bool(os.environ.get("TOPAZ_TIMINGS")
                or os.environ.get("TOPAZ_PROFILE"))


def sync_for_timing(outputs) -> None:
    """Deliberate block_until_ready policy for stage timing.

    JAX dispatch is asynchronous, so a ``stage()`` block that only launches
    a jitted call measures Python dispatch, not device compute. Call this
    on the outputs INSIDE the stage block: it is a no-op in normal runs
    (keeping the async overlap that the pipelines rely on for throughput)
    and blocks until the device work is done when TOPAZ_TIMINGS or
    TOPAZ_PROFILE is set. A tiny element fetch follows block_until_ready
    because over tunneled transports block_until_ready can return before
    results are fetchable (see ROADMAP environment notes).
    """
    if not timing_enabled():
        return
    import jax
    import numpy as np

    jax.block_until_ready(outputs)
    leaves = jax.tree_util.tree_leaves(outputs)
    if leaves:
        a = leaves[0]
        np.asarray(a[(0,) * getattr(a, "ndim", 0)])


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
