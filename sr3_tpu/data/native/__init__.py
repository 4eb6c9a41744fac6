"""ctypes loader for the native collate kernel, compiled on first use.

Falls back silently to None (callers use the numpy path) when no C++
toolchain is available. The compiled .so is cached next to the source.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "collate.cpp")
_SO = os.path.join(_HERE, "_collate.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Return the loaded library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.collate_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_float, ctypes.c_float,
                ctypes.c_void_p,
            ]
            lib.collate_normalize.restype = None
            _lib = lib
        except Exception as e:  # pragma: no cover
            logging.getLogger("base").info(
                "native collate unavailable (%s); using numpy path", e
            )
            _lib = None
        return _lib


def collate_normalize(images, lo=-1.0, hi=1.0, flip_mask=None):
    """uint8 HWC images (list, same shape) -> float32 (N,H,W,C) in [lo,hi].

    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(images)
    h, w, c = images[0].shape
    images = [np.ascontiguousarray(im) for im in images]
    out = np.empty((n, h, w, c), np.float32)
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images]
    )
    fm = None
    if flip_mask is not None:
        flip_mask = np.ascontiguousarray(
            np.asarray(flip_mask, dtype=np.uint8)
        )
        fm = flip_mask.ctypes.data_as(ctypes.c_void_p)
    lib.collate_normalize(
        ptrs, n, h, w, c,
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(lo), ctypes.c_float(hi), fm,
    )
    return out
