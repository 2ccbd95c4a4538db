"""Native (C) runtime components, loaded via ctypes with a pure-numpy
fallback. Built on first use with the system compiler into this package
directory."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cropgather.c")
_LIB = os.path.join(_DIR, "libcropgather.so")

_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.int16): 1,
    np.dtype(np.int8): 2,
    np.dtype(np.uint16): 3,
    np.dtype(np.float64): 4,
}

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception as e:  # pragma: no cover
        print(f"# WARNING: native cropgather build failed ({e}); "
              f"using numpy fallback", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:  # pragma: no cover
        return None
    lib.gather_crops.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.gather_crops.restype = None
    lib.gather_rotated_crops.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gather_rotated_crops.restype = None
    _lib = lib
    return _lib


def gather_rotated_crops(image: np.ndarray, cys: np.ndarray, cxs: np.ndarray,
                         angles: np.ndarray, hflip: np.ndarray,
                         vflip: np.ndarray, size: int) -> Optional[np.ndarray]:
    """Fused rotate+flip+crop sampling of (size x size) windows centered at
    (cys, cxs); angles in radians (counter-clockwise), nearest neighbor,
    zero fill. Returns None if the native path is unavailable."""
    lib = get_lib()
    dtype_code = _DTYPE_CODES.get(image.dtype)
    if lib is None or dtype_code is None or image.ndim != 2:
        return None
    if not image.flags["C_CONTIGUOUS"]:
        return None
    n = len(cys)
    out = np.empty((n, size, size), dtype=np.float32)
    cys = np.ascontiguousarray(cys, dtype=np.int64)
    cxs = np.ascontiguousarray(cxs, dtype=np.int64)
    angles = np.ascontiguousarray(angles, dtype=np.float64)
    hflip = np.ascontiguousarray(hflip, dtype=np.uint8)
    vflip = np.ascontiguousarray(vflip, dtype=np.uint8)
    lib.gather_rotated_crops(
        image.ctypes.data_as(ctypes.c_void_p), dtype_code,
        image.shape[0], image.shape[1],
        cys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        angles.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hflip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        vflip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def gather_crops(image: np.ndarray, ys: np.ndarray, xs: np.ndarray,
                 size: int) -> Optional[np.ndarray]:
    """Gather zero-padded (size x size) crops with top-left corners
    (ys[i], xs[i]) from a 2D array. Returns None if the native path is
    unavailable or the dtype unsupported."""
    lib = get_lib()
    dtype_code = _DTYPE_CODES.get(image.dtype)
    if lib is None or dtype_code is None or image.ndim != 2:
        return None
    if not image.flags["C_CONTIGUOUS"]:
        return None
    n = len(ys)
    out = np.empty((n, size, size), dtype=np.float32)
    ys = np.ascontiguousarray(ys, dtype=np.int64)
    xs = np.ascontiguousarray(xs, dtype=np.int64)
    lib.gather_crops(
        image.ctypes.data_as(ctypes.c_void_p),
        dtype_code,
        image.shape[0],
        image.shape[1],
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
