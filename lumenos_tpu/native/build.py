"""Build + load the native shared library (ctypes).

g++ -O3 -march=native -fopenmp; artifacts cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, "liblumenos_native.so")
_LOCK = threading.Lock()
_handle = None


def _build() -> None:
    srcs = [os.path.join(_HERE, "merkle.cpp")]
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-fPIC", "-shared",
           "-o", _LIB, *srcs]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native() -> ctypes.CDLL | None:
    """Returns the loaded library, building if needed; None on failure."""
    global _handle
    with _LOCK:
        if _handle is not None:
            return _handle
        try:
            need = not os.path.exists(_LIB)
            if not need:
                src_m = max(os.path.getmtime(os.path.join(_HERE, f))
                            for f in os.listdir(_HERE) if f.endswith(".cpp"))
                need = src_m > os.path.getmtime(_LIB)
            if need:
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.merkle_leaf_hashes.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p]
            lib.merkle_fold_level.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
            _handle = lib
            return lib
        except Exception:
            return None
