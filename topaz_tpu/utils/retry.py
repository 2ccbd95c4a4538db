"""Transient device-failure detection and bounded retry.

The reference has no failure handling at all (SURVEY §5: `cuda.set_device`
falls back to CPU with a warning, topaz/cuda.py:16-32; everything else
crashes). A TPU deployment has failure modes worth surviving in-process:
the exclusive device grant briefly held by a dying predecessor, a dropped
host↔device transport connection, a wedged remote compile that aborts the
call. These surface as generic ``XlaRuntimeError``/``RuntimeError``s whose
*message* carries the gRPC status, so classification is message-based.

Deliberately NOT transient: device OOM (``RESOURCE_EXHAUSTED`` /
"Ran out of memory") — retrying the identical program cannot succeed and
the denoise path already degrades to patches (denoise._is_hbm_oom) — and
program errors (``INVALID_ARGUMENT`` etc.), which are bugs, not weather.
"""

from __future__ import annotations

import sys
import time
from typing import Callable, TypeVar

T = TypeVar("T")

# gRPC-status and socket-level markers observed from the XLA client when
# the transport or device grant (not the program) is at fault
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "connection reset",
    "connection refused",
    "connection closed",
    "socket closed",
    "broken pipe",
    "failed to connect",
    "transport",
    "temporarily unavailable",
    "try again",
    "already claimed",
    "device grant",
)

_PERMANENT_MARKERS = (
    "Ran out of memory",
    "RESOURCE_EXHAUSTED",
    "Out of memory",
    "INVALID_ARGUMENT",
    "NOT_FOUND",
    "UNIMPLEMENTED",
)


def is_transient_device_error(e: BaseException) -> bool:
    """True when retrying the same call might succeed (transport/grant
    weather), False for program errors and OOM."""
    if isinstance(e, (ConnectionError, TimeoutError)):
        return True
    msg = str(e)
    if any(m in msg for m in _PERMANENT_MARKERS):
        return False
    low = msg.lower()
    return any(m.lower() in low for m in _TRANSIENT_MARKERS)


def retry_transient(fn: Callable[[], T], retries: int = 1,
                    base_delay: float = 2.0,
                    what: str = "device call") -> T:
    """Run ``fn``; on a *transient* failure, warn and retry up to
    ``retries`` times with exponential backoff. Non-transient errors and
    the final transient failure propagate unchanged."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered to transient below
            if attempt >= retries or not is_transient_device_error(e):
                raise
            delay = base_delay * (2 ** attempt)
            print(f"# WARNING: {what} failed with a transient device error "
                  f"({type(e).__name__}: {e}); retrying in {delay:g}s "
                  f"(attempt {attempt + 2}/{retries + 1})",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
    raise AssertionError("unreachable")
