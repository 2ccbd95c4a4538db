"""Helper to import the PyTorch reference (read-only, /root/reference) as a
numerical parity oracle in tests. The reference is never imported by the
framework itself."""

import functools
import os
import sys

REFERENCE_PATH = "/root/reference"


@functools.lru_cache(maxsize=None)
def ref_module(name: str):
    """Import e.g. 'topaz.mrc' from the reference tree."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib

    return importlib.import_module(name)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "topaz"))
