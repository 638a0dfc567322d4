"""ctypes binding + build-on-first-use for the C++ patch gather."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "patch_gather.cpp")
_LIB = os.path.join(_HERE, "libpatchgather.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            for cc in ("c++", "g++", "cc"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", "-std=c++17",
                         "-o", _LIB, _SRC, "-lpthread"],
                        check=True, capture_output=True)
                    break
                except (subprocess.CalledProcessError, FileNotFoundError):
                    continue
            else:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.gather_patches.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.gather_patches.restype = None
            _lib = lib
        except OSError:
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def gather_patches(src: np.ndarray, coords_yx: np.ndarray, win_h: int,
                   win_w: int, out: np.ndarray = None,
                   n_threads: int = 0) -> np.ndarray:
    """Crop ``len(coords)`` windows of (win_h, win_w) from ``src`` (H, W, C
    uint8, C-contiguous or a numpy memmap) at top-left (y, x) coords;
    out-of-bounds regions zero-filled. Returns (N, win_h, win_w, C) uint8.
    """
    # the C kernel indexes with dense row strides: a non-C-contiguous
    # source (Fortran-ordered .npy, sliced view) would silently scramble
    # pixels. flags checks don't materialize memmaps, so check ALL sources;
    # huge non-contiguous memmaps take the numpy fallback path upstream
    # rather than being copied here.
    if not src.flags["C_CONTIGUOUS"]:
        src = np.ascontiguousarray(src)
    if src.ndim == 2:
        src = src[..., None]
    h, w, c = src.shape
    coords = np.ascontiguousarray(np.asarray(coords_yx, dtype=np.int64))
    n = len(coords)
    if out is None:
        out = np.empty((n, win_h, win_w, c), np.uint8)

    lib = _load()
    if lib is None:  # pure-numpy fallback
        for i, (y0, x0) in enumerate(coords):
            ys, ye = max(y0, 0), min(y0 + win_h, h)
            xs, xe = max(x0, 0), min(x0 + win_w, w)
            out[i] = 0
            if ys < ye and xs < xe:
                out[i, ys - y0: ye - y0, xs - x0: xe - x0] = src[ys:ye, xs:xe]
        return out

    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    lib.gather_patches(
        src.ctypes.data_as(ctypes.c_void_p) if not isinstance(src, np.memmap)
        else ctypes.c_void_p(src.ctypes.data),
        h, w, c,
        coords.ctypes.data_as(ctypes.c_void_p), n, win_h, win_w,
        out.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out
