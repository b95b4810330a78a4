"""Native (C) host kernels, built on demand with the system compiler.

The reference's native layer is its C++/OpenMP sparse-DF extension
(_cpp/eri_sparse_DF.cpp); this package holds the equivalent host-side
kernels of the TPU build (the device side is XLA/Pallas).  Compilation
is lazy and cached; every consumer has a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from pathlib import Path

_HERE = Path(__file__).parent
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _HERE / "boys.c"
    so = _HERE / "_native.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-march=native", "-fPIC", "-shared", "-lm",
           str(src), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get_lib():
    """ctypes handle of the native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            lib.boys_batch.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_ssize_t,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.boys_batch.restype = None
            _LIB = lib
    return _LIB
