"""Native (C++) evaluator core with build-on-demand + ctypes binding.

The reference's evaluation path leans on native code (pycocotools' C
extension, numpy C inner loops); this package compiles
`eval_core.cpp` with the system g++ the first time it is needed and
exposes the two hot loops (category-gated pairwise IoU, greedy pair NMS).
Every entry point has a numpy fallback, so the package works on machines
without a toolchain; `native_available()` reports which path is live.

The .so is cached next to the source keyed by the source mtime, so edits
trigger a rebuild and repeated imports are free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "eval_core.cpp")
_LIB_PATH = os.path.join(_HERE, "_eval_core.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        src_m = os.path.getmtime(_SRC)
        if (
            os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= src_m
        ):
            return True
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", _LIB_PATH + ".tmp", _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pairwise_iou_cat.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.pairwise_iou_cat.restype = None
            lib.pairwise_nms.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.pairwise_nms.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a, ctype=ctypes.c_double):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pairwise_iou_cat(boxes1, cats1, boxes2, cats2) -> np.ndarray:
    """Category-gated Pascal(+1) IoU matrix (n1, n2)."""
    b1 = np.ascontiguousarray(boxes1, np.float64)
    b2 = np.ascontiguousarray(boxes2, np.float64)
    c1 = np.ascontiguousarray(cats1, np.int32)
    c2 = np.ascontiguousarray(cats2, np.int32)
    n1, n2 = len(b1), len(b2)
    lib = _load()
    if lib is not None:
        out = np.empty((n1, n2), np.float64)
        lib.pairwise_iou_cat(
            _fptr(b1), _fptr(c1, ctypes.c_int32), n1,
            _fptr(b2), _fptr(c2, ctypes.c_int32), n2,
            _fptr(out),
        )
        return out
    # numpy fallback (vectorized)
    a0, a1, a2, a3 = (b1[:, i][:, None] for i in range(4))
    d0, d1, d2, d3 = (b2[:, i][None, :] for i in range(4))
    s1 = (a2 - a0 + 1) * (a3 - a1 + 1)
    s2 = (d2 - d0 + 1) * (d3 - d1 + 1)
    left = np.maximum(a1, d1)
    right = np.minimum(a3, d3)
    top = np.maximum(a0, d0)
    bottom = np.minimum(a2, d2)
    inter = np.where(
        (left < right) & (top < bottom),
        (right - left + 1) * (bottom - top + 1),
        0.0,
    )
    iou = inter / (s1 + s2 - inter)
    return np.where(c1[:, None] == c2[None, :], iou, 0.0)


def pairwise_nms(subs, objs, scores, alpha, beta, thresh) -> list:
    """Greedy (sub, obj) pair NMS; returns kept indices in score order."""
    s = np.ascontiguousarray(subs, np.float64)
    o = np.ascontiguousarray(objs, np.float64)
    sc = np.ascontiguousarray(scores, np.float64)
    n = len(sc)
    lib = _load()
    if lib is None:
        return None  # caller keeps its numpy implementation
    keep = np.empty((n,), np.int32)
    k = lib.pairwise_nms(
        _fptr(s), _fptr(o), _fptr(sc), n,
        float(alpha), float(beta), float(thresh), _fptr(keep, ctypes.c_int32),
    )
    return keep[:k].tolist()
