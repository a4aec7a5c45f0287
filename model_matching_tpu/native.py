"""ctypes bindings for the native host runtime (native/mm_native.cpp).

Builds libmm_native.so on first use when a compiler is available; every
entry point has a numpy fallback, so the pure-Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmm_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("MM_NO_NATIVE") == "1":
            # documented pure-numpy mode: never build OR load
            return None
        src = os.path.join(_NATIVE_DIR, "mm_native.cpp")
        stale = os.path.exists(_SO_PATH) and os.path.exists(src) and (
            os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
        )
        if not os.path.exists(_SO_PATH) or stale:
            if os.path.exists(src) and os.environ.get("MM_NO_NATIVE") != "1":
                try:
                    subprocess.run(
                        ["make", "-C", _NATIVE_DIR, "libmm_native.so"],
                        check=True, capture_output=True, timeout=120,
                    )
                except Exception:
                    return None
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        # a stale .so from an older commit may lack newer symbols (e.g.
        # MM_NO_NATIVE=1 skipped the rebuild): fall back to numpy rather
        # than crash on the attribute lookup
        try:
            for sym in ("mm_ppf_pair_keys", "mm_parse_floats",
                        "mm_fanout_pack"):
                getattr(lib, sym)
        except AttributeError:
            return None
        lib.mm_ppf_pair_keys.restype = ctypes.c_float
        lib.mm_ppf_pair_keys.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mm_parse_floats.restype = ctypes.c_long
        lib.mm_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.mm_fanout_pack.restype = None
        lib.mm_fanout_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def ppf_pair_keys(pos: np.ndarray, normal: np.ndarray, tr: int, rot: int):
    """Packed exact-bin keys [M, M] int32 (-1 on the diagonal / out of
    range) + max pairwise distance. Threaded C++ when available."""
    lib = _load()
    m = pos.shape[0]
    if lib is None:
        return None  # caller falls back to the numpy path
    pos = np.ascontiguousarray(pos, np.float32)
    normal = np.ascontiguousarray(normal, np.float32)
    keys = np.empty((m, m), np.int32)
    maxd = lib.mm_ppf_pair_keys(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        normal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m, tr, rot,
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return keys, float(maxd)


def parse_floats(data: bytes, max_count: int) -> Optional[np.ndarray]:
    """Bulk-parse whitespace-separated floats (ascii PLY bodies)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max_count, np.float32)
    n = lib.mm_parse_floats(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_count,
    )
    return out[:n]


def fanout_pack(keys: np.ndarray, tr: int, min_bin: int,
                deltas: np.ndarray) -> Optional[np.ndarray]:
    """[U*128] packed fan-out keys (-1 rejected) for the existence-set
    build; threaded C++ when available (the 81 s numpy hot spot of
    obj_06 preprocessing; semantics in ppf_table.fanout_keys, which also
    holds the numpy fallback)."""
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, np.int32)
    deltas = np.ascontiguousarray(deltas, np.int32)
    out = np.empty(keys.shape[0] * 128, np.int32)
    lib.mm_fanout_pack(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keys.shape[0], tr, min_bin,
        deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
