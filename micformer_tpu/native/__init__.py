"""Native host-side components (C++ / ctypes).

The TPU compute path is JAX/XLA/Pallas; this package holds the native runtime
pieces around it — currently the NIfTI reader + resize kernels that feed the
input pipeline (micformer_tpu/native/nifti_native.cpp). The library is built
on demand with the in-image g++ (`make -C micformer_tpu/native`); every entry
point degrades to the pure-Python implementation when the build is
unavailable, so the framework never hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnifti_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.nifti_read_f32.restype = ctypes.POINTER(ctypes.c_float)
            lib.nifti_read_f32.argtypes = [ctypes.c_char_p,
                                           ctypes.POINTER(ctypes.c_int64)]
            lib.nifti_native_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.resize_trilinear_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int64] * 3 + [
                ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int64] * 3
            lib.resize_nearest_f32.argtypes = lib.resize_trilinear_f32.argtypes
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def read_nifti_f32(path) -> np.ndarray | None:
    """float32 volume in (z, y, x) order via the native reader, or None."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 3)()
    ptr = lib.nifti_read_f32(str(path).encode(), dims)
    if not ptr:
        return None
    n = dims[0] * dims[1] * dims[2]
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy().reshape(dims[0], dims[1], dims[2])
    lib.nifti_native_free(ptr)
    return arr


def resize_trilinear_f32(vol: np.ndarray, out_shape) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    out = np.empty(tuple(out_shape), np.float32)
    lib.resize_trilinear_f32(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *map(int, vol.shape),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *map(int, out.shape))
    return out


def resize_nearest_f32(vol: np.ndarray, out_shape) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    out = np.empty(tuple(out_shape), np.float32)
    lib.resize_nearest_f32(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *map(int, vol.shape),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *map(int, out.shape))
    return out
