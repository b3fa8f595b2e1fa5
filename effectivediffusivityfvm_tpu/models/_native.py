"""ctypes bridge to the native preprocessing library (csrc/preprocess.cpp).

Builds ``libdeffpre.so`` with g++ on first use (cached beside the package)
and exposes the C ABI; every entry point degrades gracefully to the pure
Python/scipy implementations when the toolchain or the build is unavailable,
so the framework never hard-depends on a compiler at runtime.

The C functions release the GIL for their whole duration (ctypes calls do),
which lets the datagen pipeline overlap host preprocessing of batch k+1 with
the device solve of batch k.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "native_available", "flood_fill_native", "porosity_native",
           "classify_two_phase_native", "classify_three_phase_native"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _src_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "csrc", "preprocess.cpp")


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = _src_path()
        if not os.path.exists(src):
            return None
        cache = os.environ.get(
            "DEFF_TPU_NATIVE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "deff_tpu"))
        os.makedirs(cache, exist_ok=True)
        lib_path = os.path.join(cache, "libdeffpre.so")
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            if not _build(src, lib_path):
                return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.classify_two_phase.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.classify_three_phase.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.porosity.argtypes = [u8p, ctypes.c_int64]
        lib.porosity.restype = ctypes.c_double
        lib.flood_fill.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32, u8p, u8p]
        lib.flood_fill.restype = ctypes.c_int
        lib.flood_fill_batch.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                         ctypes.c_int32, u8p, u8p, i32p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def flood_fill_native(solid: np.ndarray):
    """Native flood fill; returns (participating, isolated, path_flag) or
    None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    solid = np.ascontiguousarray(solid, dtype=np.uint8)
    ny, nx = solid.shape
    part = np.empty_like(solid)
    iso = np.empty_like(solid)
    flag = lib.flood_fill(_u8(solid), ny, nx, _u8(part), _u8(iso))
    return part.astype(bool), iso.astype(bool), bool(flag)


def porosity_native(img: np.ndarray) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    return float(lib.porosity(_u8(img), img.size))


def classify_two_phase_native(img: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty_like(img)
    lib.classify_two_phase(_u8(img), img.size, _u8(out))
    return out


def classify_three_phase_native(img: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty_like(img)
    lib.classify_three_phase(_u8(img), img.size, _u8(out))
    return out
