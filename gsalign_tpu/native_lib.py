"""Native (C++) kernel loading.

Builds native/sais.cpp into a shared library on first use (g++, cached next
to the source) and exposes it via ctypes. Falls back to the pure-Python
paths if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsalign_native.so")
_SOURCES = ["sais.cpp"]
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
    if os.path.exists(_LIB_PATH) and all(
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(s) for s in srcs):
        return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sais_u8_i32.restype = ctypes.c_int
        lib.sais_u8_i32.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
        lib.sais_u8_i64.restype = ctypes.c_int
        lib.sais_u8_i64.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        _lib = lib
        return _lib


def sais(text_with_sentinel: np.ndarray) -> Optional[np.ndarray]:
    """Suffix array of a uint8 text whose last byte is the unique 0 sentinel.

    Returns int64[n] or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    t = np.ascontiguousarray(text_with_sentinel, dtype=np.uint8)
    n = int(t.shape[0])
    if n < (1 << 31):
        sa = np.empty(n, dtype=np.int32)
        rc = lib.sais_u8_i32(t, n, sa)
        if rc != 0:
            raise RuntimeError(f"sais_u8_i32 failed: {rc}")
        return sa
    sa = np.empty(n, dtype=np.int64)
    rc = lib.sais_u8_i64(t, n, sa)
    if rc != 0:
        raise RuntimeError(f"sais_u8_i64 failed: {rc}")
    return sa
