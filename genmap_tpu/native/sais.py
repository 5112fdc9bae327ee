"""ctypes loader for the native SA-IS library (compiled on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None


def _build_lib() -> str:
    src = os.path.join(os.path.dirname(__file__), "sais.cpp")
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "genmap_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, "libgenmap_sais.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    with tempfile.TemporaryDirectory() as td:
        tmp = os.path.join(td, "libgenmap_sais.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-o", tmp, src],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, out)
    return out


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.genmap_sais_u8_i32.restype = ctypes.c_int
        lib.genmap_sais_u8_i32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.genmap_sais_u8_i64.restype = ctypes.c_int
        lib.genmap_sais_u8_i64.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _LIB = lib
    return _LIB


def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 text (arbitrary bytes, repeated values fine).

    Internally shifts the alphabet up by one and appends a unique smallest
    terminal (this preserves plain lexicographic suffix order), runs SA-IS,
    and drops the terminal's entry.
    """
    n = len(text)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t = np.empty(n + 1, dtype=np.uint8)
    np.add(text, 1, out=t[:n], casting="unsafe")
    t[n] = 0
    k = int(t[:n].max())
    lib = _lib()
    if n + 1 < 2**31:
        sa = np.empty(n + 1, dtype=np.int32)
        rc = lib.genmap_sais_u8_i32(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n + 1,
            k,
        )
    else:
        sa = np.empty(n + 1, dtype=np.int64)
        rc = lib.genmap_sais_u8_i64(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n + 1,
            k,
        )
    if rc != 0:
        raise RuntimeError("sais failed")
    assert sa[0] == n
    return sa[1:].astype(np.int64)
