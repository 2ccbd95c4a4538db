"""SIGTERM handling for the long-running service commands.

``topaz watch`` and ``topaz serve`` are deployed under process managers
(systemd, k8s, SLURM) whose stop path is SIGTERM — which by default kills
Python without running ``finally`` blocks, skipping the manifest flush /
server close that the KeyboardInterrupt (^C) path performs. This context
manager makes SIGTERM raise KeyboardInterrupt in the main thread so both
stop signals share one orderly-shutdown path.

The reference has no long-running commands and therefore no stop handling
(its CLI registry is batch jobs only, topaz/main.py:87-126).
"""

from __future__ import annotations

import contextlib
import signal
import threading


@contextlib.contextmanager
def sigterm_as_interrupt():
    """Within the block, SIGTERM raises KeyboardInterrupt (main thread
    only — signal handlers cannot be installed elsewhere, so nested or
    threaded use degrades to a no-op). The previous handler is restored
    on exit."""
    if threading.current_thread() is not threading.main_thread():
        yield
        return

    def _raise(signum, frame):
        raise KeyboardInterrupt

    try:
        prev = signal.signal(signal.SIGTERM, _raise)
    except ValueError:  # e.g. signal not supported in this interpreter
        yield
        return
    try:
        yield
    finally:
        signal.signal(signal.SIGTERM, prev)
