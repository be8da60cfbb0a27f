"""ctypes bridge to the native data loader (dataio.cpp).

Compiles the shared library on first use (g++, cached next to the source)
and falls back to pure-python parsing when no toolchain is available — the
API is identical either way.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

log = logging.getLogger("voicecraft_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataio.cpp")
_LIB = os.path.join(_HERE, "libvcdataio.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _LIB, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.info("native dataio build failed (%s); using python fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.vc_load_codes.restype = ctypes.c_int
        lib.vc_load_codes.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.vc_load_codes_batch.restype = ctypes.c_int
        lib.vc_load_codes_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        _lib = lib
    except OSError as e:
        log.info("native dataio unavailable: %s", e)
    return _lib


def _py_load_codes(path: str, n_codebooks: int) -> Optional[np.ndarray]:
    try:
        with open(path) as f:
            rows = [l.split() for i, l in enumerate(f) if i < n_codebooks]
        if len(rows) < n_codebooks or any(not r for r in rows):
            return None
        t = min(len(r) for r in rows)
        return np.asarray([[int(v) for v in r[:t]] for r in rows], np.int32)
    except Exception:
        return None


def load_codes(path: str, n_codebooks: int,
               max_t: int = 8192) -> Optional[np.ndarray]:
    """Read one K-row code file -> [K, T] int32 or None."""
    lib = get_lib()
    if lib is None:
        return _py_load_codes(path, n_codebooks)
    buf = np.empty((n_codebooks, max_t), np.int32)
    t = lib.vc_load_codes(path.encode(), n_codebooks,
                          buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                          max_t)
    if t < 0:
        return None
    return buf[:, :t].copy()


def load_codes_batch(paths: List[str], n_codebooks: int, max_t: int = 8192,
                     n_threads: int = 0) -> List[Optional[np.ndarray]]:
    """Parallel batch read -> list of [K, T_i] arrays (None per failure)."""
    lib = get_lib()
    if lib is None:
        return [_py_load_codes(p, n_codebooks) for p in paths]
    n = len(paths)
    buf = np.empty((n, n_codebooks, max_t), np.int32)
    lens = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.vc_load_codes_batch(
        arr, n, n_codebooks,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_t,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    return [buf[i, :, :lens[i]].copy() if lens[i] >= 0 else None
            for i in range(n)]
