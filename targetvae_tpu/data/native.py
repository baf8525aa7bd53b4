"""ctypes binding to the native host data runtime (native/tvae_native.cpp).

Auto-builds the shared library with the system toolchain on first use when
possible; every entry point has a pure-numpy fallback so the framework works
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtvae_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _MrcInfo(ctypes.Structure):
    _fields_ = [("nx", ctypes.c_int32), ("ny", ctypes.c_int32),
                ("nz", ctypes.c_int32), ("mode", ctypes.c_int32),
                ("ext_bytes", ctypes.c_int32)]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.environ.get(
                "TARGETVAE_NO_NATIVE_BUILD") is None:
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tvae_mrc_info.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(_MrcInfo)]
        lib.tvae_mrc_info.restype = ctypes.c_int
        lib.tvae_mrc_load_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.tvae_mrc_load_f32.restype = ctypes.c_int
        lib.tvae_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.tvae_gather_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_mrc_f32(path: str, crop: int = 0, normalize: bool = False,
                 nthreads: int = 0) -> np.ndarray:
    """Native fast path: mmap + multithreaded decode/crop/standardize.

    Falls back to the numpy implementation when the library or MRC mode is
    unsupported.
    """
    lib = get_lib()
    if lib is not None:
        info = _MrcInfo()
        if lib.tvae_mrc_info(path.encode(), ctypes.byref(info)) == 0 and \
                info.mode in (0, 1, 2, 6):
            n = crop if crop > 0 else info.ny
            m = crop if crop > 0 else info.nx
            out = np.empty((info.nz, n, m), dtype=np.float32)
            nthreads = nthreads or min(os.cpu_count() or 1, 16)
            rc = lib.tvae_mrc_load_f32(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                crop, int(normalize), nthreads)
            if rc == 0:
                return out
    # fallback (no recursion into datasets.load_particles, which calls us)
    from . import mrc
    from .datasets import preprocess_particles
    arr, _ = mrc.read_mmap(path)
    imgs = np.asarray(arr, dtype=np.float32)
    if imgs.ndim == 2:
        imgs = imgs[None]
    return preprocess_particles(imgs, crop, normalize)


def gather_f32(images: np.ndarray, idx: np.ndarray,
               nthreads: int = 0) -> np.ndarray:
    """out[i] = images[idx[i]] with multithreaded memcpy."""
    lib = get_lib()
    images = np.ascontiguousarray(images, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None or images.ndim < 2:
        return images[idx]
    rows = images.shape[1]
    cols = int(np.prod(images.shape[2:])) if images.ndim > 2 else 1
    out = np.empty((len(idx),) + images.shape[1:], dtype=np.float32)
    lib.tvae_gather_f32(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads or min(os.cpu_count() or 1, 8))
    return out
