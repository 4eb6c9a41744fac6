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
_DECODE_SRC = os.path.join(_HERE, "decode.cpp")
_SO = os.path.join(_HERE, "_collate.so")
_DECODE_SO = os.path.join(_HERE, "_decode.so")

_lock = threading.Lock()
_lib = None
_tried = False
_decode_lib = None
_decode_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _build_decode():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _DECODE_SRC, "-o", _DECODE_SO, "-lpng16",
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


def get_decode_lib():
    """Return the libpng-backed decoder library or None."""
    global _decode_lib, _decode_tried
    with _lock:
        if _decode_tried:
            return _decode_lib
        _decode_tried = True
        try:
            if (not os.path.exists(_DECODE_SO)) or (
                os.path.getmtime(_DECODE_SO) < os.path.getmtime(_DECODE_SRC)
            ):
                _build_decode()
            lib = ctypes.CDLL(_DECODE_SO)
            lib.decode_collate_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_float, ctypes.c_float,
                ctypes.c_void_p,
            ]
            lib.decode_collate_normalize.restype = ctypes.c_int64
            _decode_lib = lib
        except Exception as e:  # pragma: no cover
            logging.getLogger("base").info(
                "native decoder unavailable (%s); using PIL path", e
            )
            _decode_lib = None
        return _decode_lib


def decode_collate_normalize(buffers, h, w, lo=-1.0, hi=1.0, flip_mask=None):
    """Compressed PNG byte strings -> float32 (N,H,W,3) in [lo,hi], decoded
    and normalized in C++ worker threads. Returns None on any failure (caller
    falls back to the PIL path)."""
    lib = get_decode_lib()
    if lib is None:
        return None
    n = len(buffers)
    out = np.empty((n, h, w, 3), np.float32)
    bufs = (ctypes.c_void_p * n)(
        *[
            ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p).value
            for b in buffers
        ]
    )
    lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    fm = None
    if flip_mask is not None:
        flip_mask = np.ascontiguousarray(np.asarray(flip_mask, dtype=np.uint8))
        fm = flip_mask.ctypes.data_as(ctypes.c_void_p)
    err = lib.decode_collate_normalize(
        bufs, lens, n, h, w,
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(lo), ctypes.c_float(hi), fm,
    )
    if err != 0:
        logging.getLogger("base").warning(
            "native decode failed on image %d; falling back", err - 1
        )
        return None
    return out


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
