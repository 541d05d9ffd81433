"""Native (C++) components, bound via ctypes with transparent fallback.

Built on demand with g++ (cached as .so next to the sources). If the
toolchain is unavailable the callers fall back to the pure-python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-o', out, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_coco_match() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the greedy-match library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_DIR, 'libcoco_match.so')
        src = os.path.join(_DIR, 'coco_match.cpp')
        if not os.path.exists(so) or \
                os.path.getmtime(so) < os.path.getmtime(src):
            if not _build(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.greedy_match.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS'),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
        ]
        lib.greedy_match.restype = None
        _LIB = lib
        return _LIB


def greedy_match_native(iou_thrs: np.ndarray, ious: np.ndarray,
                        gt_ignore: np.ndarray, gt_crowd: np.ndarray):
    """(T,), (D, G), (G,), (G,) -> (dtm (T, D) int64, dtig (T, D) bool);
    returns None when the native library is unavailable."""
    lib = load_coco_match()
    if lib is None:
        return None
    T = len(iou_thrs)
    D, G = ious.shape
    dtm = np.zeros((T, D), np.int64)
    dtig = np.zeros((T, D), np.uint8)
    if D and G:
        lib.greedy_match(
            T, np.ascontiguousarray(iou_thrs, np.float64), D, G,
            np.ascontiguousarray(ious, np.float32),
            np.ascontiguousarray(gt_ignore, np.uint8),
            np.ascontiguousarray(gt_crowd, np.uint8), dtm, dtig)
    return dtm, dtig.astype(bool)
