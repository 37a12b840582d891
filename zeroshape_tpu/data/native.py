"""ctypes bindings for the native data-loading library (native/zsdl.cpp).

Decode work (PNG/JPEG -> float32 NHWC, .npy reads) runs in C++ outside the
GIL. Auto-builds ``native/libzsdl.so`` on first use when a toolchain is
present; every entry point degrades to the PIL/numpy path when the library
is unavailable, so the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libzsdl.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.zsdl_decode_image.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.zsdl_decode_image.restype = ctypes.c_int
            lib.zsdl_image_size.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.zsdl_image_size.restype = ctypes.c_int
            lib.zsdl_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.zsdl_decode_batch.restype = ctypes.c_int
            lib.zsdl_load_npy.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
            ]
            lib.zsdl_load_npy.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def image_size(path: str):
    lib = _load()
    if lib is None:
        return None
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    if lib.zsdl_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)) != 0:
        return None
    return h.value, w.value, c.value


def decode_image(path: str, out_hw=None, channels: int = 3) -> Optional[np.ndarray]:
    """float32 [H, W, channels] in [0, 1], bilinear-resized when out_hw given."""
    lib = _load()
    if lib is None:
        return None
    if out_hw is None:
        size = image_size(path)
        if size is None:
            return None
        out_hw = size[:2]
    h, w = out_hw
    out = np.empty((h, w, channels), np.float32)
    rc = lib.zsdl_decode_image(
        path.encode(), h, w, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def decode_batch(paths: Sequence[str], out_hw, channels: int = 3, n_threads: int = 4):
    """float32 [N, H, W, channels]; returns None on any failure."""
    lib = _load()
    if lib is None:
        return None
    h, w = out_hw
    n = len(paths)
    out = np.empty((n, h, w, channels), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    good = lib.zsdl_decode_batch(
        arr, n, h, w, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return out if good == n else None


def load_npy(path: str, max_elems: Optional[int] = None) -> Optional[np.ndarray]:
    """float32 array from a .npy file (f4/f8/i4/i8, C order)."""
    lib = _load()
    if lib is None:
        return None
    if max_elems is None:
        # the smallest supported element is 4 bytes, so file size / 4 bounds
        # the element count (a fixed 64M-element buffer was 256 MB of
        # allocation churn per call in the loader threads)
        try:
            max_elems = max(1, os.path.getsize(path) // 4)
        except OSError:
            return None
    out = np.empty((max_elems,), np.float32)
    shape = (ctypes.c_longlong * 8)()
    ndim = lib.zsdl_load_npy(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems, shape, 8,
    )
    if ndim < 0:
        return None
    dims = [shape[i] for i in range(ndim)]
    total = int(np.prod(dims)) if dims else 1
    return out[:total].reshape(dims).copy()
