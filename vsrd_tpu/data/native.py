"""ctypes loader for the native data-path kernels (native/vsrd_native.cpp).

Compiles the shared library on first use (g++ -O3) and caches it next to
the source; every entry point has a pure-numpy fallback, so the package
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_path():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
        "vsrd_native.cpp",
    )


def _build(source: str, target: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", target, source],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the loaded library or None (fallbacks used)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        source = _source_path()
        if not os.path.exists(source):
            return None
        target = os.path.join(os.path.dirname(source), "libvsrd_native.so")
        if not os.path.exists(target) or (
            os.path.getmtime(target) < os.path.getmtime(source)
        ):
            if not _build(source, target):
                return None
        try:
            lib = ctypes.CDLL(target)
        except OSError:
            return None

        i64 = ctypes.c_int64
        lib.rle_decode.argtypes = [
            ctypes.POINTER(i64), i64, i64, i64, ctypes.c_char_p,
        ]
        lib.rle_encode.restype = i64
        lib.rle_encode.argtypes = [
            ctypes.c_char_p, i64, i64, ctypes.POINTER(i64), i64,
        ]
        lib.polygon_distance_map.argtypes = [
            ctypes.POINTER(ctypes.c_float), i64, i64, i64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.polygon_fill.argtypes = [
            ctypes.POINTER(ctypes.c_float), i64, i64, i64, ctypes.c_char_p,
        ]
        _LIB = lib
        return _LIB


def rle_decode_native(counts, size):
    lib = load()
    if lib is None:
        return None
    h, w = int(size[0]), int(size[1])
    counts_arr = np.ascontiguousarray(counts, dtype=np.int64)
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(
        counts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(counts_arr), h, w,
        out.ctypes.data_as(ctypes.c_char_p),
    )
    return out


def rle_encode_native(mask):
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    max_counts = h * w + 2
    counts = np.zeros(max_counts, np.int64)
    num = lib.rle_encode(
        mask.ctypes.data_as(ctypes.c_char_p), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_counts,
    )
    if num < 0:
        return None
    return counts[:num].tolist()


def polygon_distance_map_native(polygon, image_size):
    lib = load()
    if lib is None:
        return None
    polygon = np.ascontiguousarray(polygon, dtype=np.float32)
    h, w = int(image_size[0]), int(image_size[1])
    out = np.zeros((h, w), np.float32)
    lib.polygon_distance_map(
        polygon.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(polygon), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
