"""Native (C++) host-side runtime components, bound via ctypes.

Built lazily with g++ at first import (cached next to the source); all
callers fall back to the pure-numpy implementations when unavailable
(evaluation/rle.py), so the framework works toolchain-free too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "rle_native.cpp")
_SO = os.path.join(_HERE, "librle_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i64p, ctypes.c_int]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.rle_counts_to_string.restype = ctypes.c_int
    lib.rle_counts_to_string.argtypes = [i64p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
    lib.rle_string_to_counts.restype = ctypes.c_int
    lib.rle_string_to_counts.argtypes = [
        ctypes.c_char_p, ctypes.c_int, i64p, ctypes.c_int,
    ]
    lib.bbox_iou_matrix.restype = None
    lib.bbox_iou_matrix.argtypes = [
        f64p, ctypes.c_int, f64p, ctypes.c_int, u8p, f64p,
    ]
    lib.rle_iou_single.restype = ctypes.c_double
    lib.rle_iou_single.argtypes = [i64p, ctypes.c_int, i64p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# numpy-facing wrappers (None-safe: callers check get_lib() first)
# ---------------------------------------------------------------------------

def native_encode_counts(mask: np.ndarray) -> Optional[List[int]]:
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    cap = m.size + 2
    out = np.empty(cap, np.int64)
    n = lib.rle_encode(m, m.shape[0], m.shape[1], out, cap)
    if n < 0:
        return None
    return out[:n].tolist()


def native_decode(counts: List[int], h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, dtype=np.int64)
    out = np.empty((h, w), np.uint8)
    lib.rle_decode(c, len(c), h, w, out)
    return out


def native_counts_to_string(counts: List[int]) -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, dtype=np.int64)
    cap = 16 * len(c) + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.rle_counts_to_string(c, len(c), buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def native_string_to_counts(s: str) -> Optional[List[int]]:
    lib = get_lib()
    if lib is None:
        return None
    b = s.encode("ascii")
    cap = len(b) + 2
    out = np.empty(cap, np.int64)
    n = lib.rle_string_to_counts(b, len(b), out, cap)
    if n < 0:
        return None
    return out[:n].tolist()


def native_bbox_iou(dt: np.ndarray, gt: np.ndarray,
                    iscrowd: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    dt = np.ascontiguousarray(dt, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    ic = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.empty((len(dt), len(gt)), np.float64)
    lib.bbox_iou_matrix(dt, len(dt), gt, len(gt), ic, out)
    return out


def native_rle_iou(a: List[int], b: List[int], iscrowd: bool) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    aa = np.ascontiguousarray(a, np.int64)
    bb = np.ascontiguousarray(b, np.int64)
    return float(lib.rle_iou_single(aa, len(aa), bb, len(bb), int(iscrowd)))
