"""On-demand build + ctypes binding of the native projection core.

Compiles ``projection.cc`` with g++ into ``_projection.so`` next to the
source (rebuilt when the source is newer), then binds ``project_scan`` via
ctypes. Falls back gracefully: ``load_native()`` returns None when no
compiler is available, and callers (data/projection.py) use the vectorized
numpy path instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "projection.cc")
_LIB = os.path.join(_DIR, "_projection.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", _LIB + ".tmp",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the bound library, building it if needed; None on failure."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.project_scan.restype = ctypes.c_int
    lib.project_scan.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # points
        ctypes.c_int64,                  # n
        ctypes.c_int,                    # H
        ctypes.c_int,                    # W
        ctypes.c_int,                    # scan_unfolding
        ctypes.c_float,                  # min_depth
        ctypes.c_float,                  # max_depth
        ctypes.POINTER(ctypes.c_float),  # out
    ]
    _lib = lib
    return _lib
