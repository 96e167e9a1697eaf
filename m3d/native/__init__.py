"""Native host-runtime library: build + ctypes bindings with numpy fallback.

The shared library is compiled from src/m3d_native.cpp on first import
(g++ -O3, cached next to the source). Every entry point has a pure-numpy
fallback so the framework keeps working without a toolchain; when the
library is present it takes over the host data-path hot loops (TIFF decode,
IoU matrix, greedy NMS).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "m3d_native.cpp")
_LIB_PATH = os.path.join(_DIR, "libm3d_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB_PATH + ".tmp", _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=300,
        )
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        print(f"[m3d.native] build failed ({e}); using numpy fallbacks")
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        if not _build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[m3d.native] load failed ({e}); using numpy fallbacks")
        _lib = False
        return _lib

    lib.iou_matrix_3d.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.nms_3d_host.restype = ctypes.c_int64
    lib.nms_3d_host.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tiff_read_dims.restype = ctypes.c_int
    lib.tiff_read_dims.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int64)] * 4
    lib.tiff_read_data.restype = ctypes.c_int
    lib.tiff_read_data.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def iou_matrix_3d(boxes_a: np.ndarray, boxes_b: np.ndarray,
                  n_threads: int = 0) -> np.ndarray:
    """Pairwise IoU [A,6] x [G,6] -> [A,G] float32 (native if available)."""
    a = np.ascontiguousarray(boxes_a, np.float32)
    b = np.ascontiguousarray(boxes_b, np.float32)
    lib = _load()
    if not lib:
        from m3d.data.rpn_targets import overlaps_3d_numpy

        return overlaps_3d_numpy(a, b)
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    lib.iou_matrix_3d(_fptr(a), a.shape[0], _fptr(b), b.shape[0],
                      _fptr(out), n_threads)
    return out


def nms_3d_host(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
                max_output: int) -> np.ndarray:
    """Greedy NMS -> kept indices int32 (native if available)."""
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    lib = _load()
    if not lib:
        from m3d.ops.nms3d import nms_3d_numpy

        return nms_3d_numpy(b, s, iou_threshold, max_output)
    keep = np.empty(max_output, np.int32)
    n = lib.nms_3d_host(_fptr(b), _fptr(s), b.shape[0],
                        ctypes.c_float(iou_threshold), max_output,
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return keep[:n]


def read_tiff_volume(path: str):
    """Multi-page TIFF -> array [pages, H, W]; None if unsupported format."""
    lib = _load()
    if not lib:
        return None
    pages = ctypes.c_int64()
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    bits = ctypes.c_int64()
    rc = lib.tiff_read_dims(path.encode(), ctypes.byref(pages),
                            ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(bits))
    if rc != 0:
        return None
    dtype = np.uint8 if bits.value == 8 else np.uint16
    out = np.empty((pages.value, h.value, w.value), dtype)
    rc = lib.tiff_read_data(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes,
    )
    return out if rc == 0 else None
