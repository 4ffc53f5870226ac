"""ctypes loader for the native host-side columnar kernels (fastcol.cpp).

Builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-python/numpy fallback so the
engine works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastcol.cpp")
_SO = os.path.join(_HERE, "libfastcol.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", _SO + ".tmp"],
                    check=True, capture_output=True, timeout=120)
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            lib.dict_encode.restype = ctypes.c_int64
            lib.dict_encode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def dict_encode_bytes(blob: bytes, offsets: np.ndarray,
                      valid: np.ndarray):
    """Encode n strings (concatenated ``blob`` + int64 offsets[n+1]) into
    (codes int32[n], representative_rows int64[n_distinct]) with
    lexicographically-sorted code order.  Returns None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(offsets) - 1
    codes = np.zeros(n, dtype=np.int32)
    dict_rows = np.zeros(max(n, 1), dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    valid_u8 = np.ascontiguousarray(valid, dtype=np.uint8)
    n_distinct = lib.dict_encode(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dict_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return codes, dict_rows[:n_distinct]


def gather_blob_bytes(dict_blob: bytes, dict_offsets: np.ndarray,
                      codes: np.ndarray, valid, total: int):
    """Concatenate dictionary payloads for each row (NULL rows contribute
    nothing).  Returns the bytes, or None if the native library is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_gather_blob_ready"):
        lib.gather_blob.restype = None
        lib.gather_blob.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_char_p]
        lib._gather_blob_ready = True
    n = len(codes)
    out = ctypes.create_string_buffer(max(total, 1))
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    dict_offsets = np.ascontiguousarray(dict_offsets, dtype=np.int64)
    valid_ptr = None
    if valid is not None:
        valid_u8 = np.ascontiguousarray(valid, dtype=np.uint8)
        valid_ptr = valid_u8.ctypes.data_as(ctypes.c_char_p)
    lib.gather_blob(
        dict_blob,
        dict_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid_ptr, n, out)
    return out.raw[:total]


def concat_groups(dict_blob: bytes, dict_offsets: np.ndarray,
                  codes: np.ndarray, valid, group_starts: np.ndarray,
                  separator: bytes, distinct: bool):
    """CONCAT aggregation byte assembly over grouped rows: joins each
    group's non-null dictionary payloads with ``separator`` in row order
    (reference: aggregation_operators.h CONCAT).  Returns
    (blob bytes, lengths int64[g]; -1 length = all-NULL group) or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_concat_groups_ready"):
        lib.concat_groups.restype = ctypes.c_int64
        lib.concat_groups.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p]
        lib._concat_groups_ready = True
    g = len(group_starts) - 1
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    dict_offsets = np.ascontiguousarray(dict_offsets, dtype=np.int64)
    group_starts = np.ascontiguousarray(group_starts, dtype=np.int64)
    lens = np.empty(max(g, 1), dtype=np.int64)
    valid_ptr = None
    if valid is not None:
        valid_u8 = np.ascontiguousarray(valid, dtype=np.uint8)
        valid_ptr = valid_u8.ctypes.data_as(ctypes.c_char_p)
    args = [dict_blob,
            dict_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            valid_ptr,
            group_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            g, separator, len(separator), 1 if distinct else 0]
    total = lib.concat_groups(
        *args, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), None)
    out = ctypes.create_string_buffer(max(int(total), 1))
    lib.concat_groups(*args, None, out)
    return out.raw[:total], lens[:g]


def kway_merge(codes: np.ndarray, starts: np.ndarray):
    """Merge k sorted runs by row codes: ``codes`` is [n_total, m] uint64
    (ascending lexicographic == output order), ``starts`` is int64[k+1]
    run offsets.  Returns int64[n_total] global row ids in merged order,
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_kway_ready"):
        lib.kway_merge_u64.restype = None
        lib.kway_merge_u64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib._kway_ready = True
    codes = np.ascontiguousarray(codes, dtype=np.uint64)
    if codes.ndim == 1:
        codes = codes[:, None]
    n, m = codes.shape
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    lib.kway_merge_u64(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), m,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(starts) - 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
