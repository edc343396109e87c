"""Loader for the native host-runtime library (ccve_native.cpp).

Compiles lazily with g++ into a cached .so next to the source; falls back to
None (callers use the NumPy ports in core/datagen.py and the vectorized
builders in ops/) when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ccve_native.cpp")
_SO = os.path.join(_HERE, "build", "libccve_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-funroll-loops",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load():
    """Return the ctypes library, compiling if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (not os.path.exists(_SO)) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if stale and not _compile():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i64 = ctypes.c_int64
        p64 = ctypes.POINTER(ctypes.c_int64)
        pu64 = ctypes.POINTER(ctypes.c_uint64)
        lib.ccve_murmurhash64.argtypes = [p64, i64, pu64]
        lib.ccve_murmurhash64.restype = None
        lib.ccve_gen_probe_table.argtypes = [i64, i64, i64, p64]
        lib.ccve_gen_probe_table.restype = None
        lib.ccve_gen_rhs_table.argtypes = [i64, i64, p64, p64]
        lib.ccve_gen_rhs_table.restype = None
        lib.ccve_gen_microbench_keys.argtypes = [i64, i64, i64, p64]
        lib.ccve_gen_microbench_keys.restype = None
        lib.ccve_build_lp.argtypes = [p64, p64, i64, i64, p64, p64]
        lib.ccve_build_lp.restype = i64
        lib.ccve_build_chaining_csr.argtypes = [p64, p64, i64, i64, p64, p64, p64]
        lib.ccve_build_chaining_csr.restype = i64
        lib.ccve_make_chunk_batch.argtypes = [p64, i64, i64, i64, i64, i64, p64]
        lib.ccve_make_chunk_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None
