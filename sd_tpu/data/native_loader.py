"""ctypes bindings for the native C++ data-loader core (native/dataloader.cpp).

The hot host-side input path — file read, JPEG/PNG decode, center-crop,
bilinear resize, [-1,1] normalization, optional hflip — runs in a C++
worker pool with zero Python in the loop (the in-repo equivalent of the
reference's torch-DataLoader/OpenCV native stack, SURVEY.md §2.9). Builds
on demand via ``make -C native``; falls back cleanly if the toolchain or
libjpeg/libpng are absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["NativeImageLoader", "native_available"]

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "libsdt_dataloader.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.sdt_create_pool.restype = ctypes.c_void_p
    lib.sdt_create_pool.argtypes = [ctypes.c_int]
    lib.sdt_destroy_pool.argtypes = [ctypes.c_void_p]
    lib.sdt_load_batch.restype = ctypes.c_int
    lib.sdt_load_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeImageLoader:
    """Worker-pool batch image loader.

    ``load_batch(paths, size)`` -> (batch [N, size, size, 3] float32 in
    [-1, 1], ok [N] bool). Deterministic per-seed random hflip (seed < 0
    disables), matching the LSUN/ImageNet preprocessing contract.
    """

    def __init__(self, num_threads: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native dataloader unavailable (toolchain or libjpeg/libpng "
                "missing); use the Python datasets instead"
            )
        self._lib = lib
        self._pool = lib.sdt_create_pool(num_threads)

    def __del__(self):
        if getattr(self, "_pool", None):
            self._lib.sdt_destroy_pool(self._pool)
            self._pool = None

    def load_batch(self, paths: Sequence[str], size: int,
                   flip_seed: int = -1) -> Tuple[np.ndarray, np.ndarray]:
        n = len(paths)
        out = np.zeros((n, size, size, 3), np.float32)
        ok = np.zeros((n,), np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        self._lib.sdt_load_batch(
            self._pool, c_paths, n, size, flip_seed,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out, ok.astype(bool)
