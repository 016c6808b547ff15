"""Host-side suffix-array construction.

Primary path: native SA-IS (O(n), native/sais.cpp) loaded via ctypes.
Fallback: NumPy prefix-doubling (O(n log^2 n)) — always available, used when
the native library has not been built.

Replaces the reference's multithreaded comparison quicksort
(libkit4b/SfxArray.cpp:9739 QSortSeq + MTqsort); the sorted order is unique,
so outputs are interchangeable.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libkit4b_native.so"))

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # Attempt a lazy build if a toolchain is present.
        try:
            import subprocess
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=300)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    try:
        lib.pack2bit_u8.restype = ctypes.c_int64
        lib.pack2bit_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.format_sam_se.restype = ctypes.c_int64
        lib.format_sam_se.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.format_sam_pe.restype = ctypes.c_int64
        lib.format_sam_pe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.bucket_index.restype = ctypes.c_int64
        lib.bucket_index.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:
        pass   # older .so without hostops
    lib.sais_u8_i32.restype = ctypes.c_int
    lib.sais_u8_i32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.sais_u8_i64.restype = ctypes.c_int
    lib.sais_u8_i64.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def suffix_array_doubling(text: np.ndarray) -> np.ndarray:
    """Prefix-doubling suffix array; pure NumPy fallback."""
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(text)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = text.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # Composite key: (rank[i], rank[i+k]) with -1 past the end.
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order
        tmp[sa[0]] = 0
        prev, cur = sa[:-1], sa[1:]
        newgrp = (rank[cur] != rank[prev]) | (second[cur] != second[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def build_suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 text. int32 when n < 2^31, else int64."""
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(text)
    lib = _load_native()
    if lib is None:
        sa = suffix_array_doubling(text)
        return sa.astype(np.int32 if n < 2**31 else np.int64)
    if n < 2**31 - 1:
        sa = np.empty(n, dtype=np.int32)
        rc = lib.sais_u8_i32(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
    else:
        sa = np.empty(n, dtype=np.int64)
        rc = lib.sais_u8_i64(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
    if rc != 0:
        raise RuntimeError(f"native sais failed with code {rc}")
    return sa
