"""ctypes wrapper for the native threaded npy/npz batch loader.

See native/io/npy_loader.cc — the C++ replacement for the reference's torch
DataLoader worker processes. Falls back to numpy transparently when the
shared library has not been built (run native/build_native.sh).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = Path(__file__).parent / "_native" / "libdiffphycon_io.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.dpc_npy_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dpc_npy_info.restype = ctypes.c_int
    lib.dpc_load_npy_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.dpc_load_npy_batch.restype = ctypes.c_int
    lib.dpc_load_npz_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.dpc_load_npz_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def npy_info(path: str):
    """(shape tuple, dtype code) of an .npy file via the native parser."""
    lib = _load_lib()
    if lib is None:
        a = np.load(path, mmap_mode="r")
        return tuple(a.shape), a.dtype
    shape = (ctypes.c_long * 8)()
    ndim = ctypes.c_int()
    dt = ctypes.c_int()
    rc = lib.dpc_npy_info(path.encode(), shape, ctypes.byref(ndim),
                          ctypes.byref(dt))
    if rc != 0:
        # e.g. fortran-ordered file: fall back to numpy
        a = np.load(path, mmap_mode="r")
        return tuple(a.shape), a.dtype
    return tuple(shape[: ndim.value]), dt.value


def load_npy_batch(paths: Sequence[str], shape,
                   n_threads: Optional[int] = None) -> np.ndarray:
    """Load N same-shaped .npy files into one (N, *shape) float32 array with
    the native thread pool; numpy fallback when the library is missing."""
    lib = _load_lib()
    n = len(paths)
    elems = int(np.prod(shape))
    out = np.empty((n,) + tuple(shape), np.float32)
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = np.load(p).astype(np.float32)
        return out
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nt = n_threads or min(os.cpu_count() or 8, 16)
    rc = lib.dpc_load_npy_batch(
        c_paths, n, nt, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        elems)
    if rc != 0:
        # unsupported layout (e.g. fortran order): numpy fallback
        for i, p in enumerate(paths):
            out[i] = np.load(p).astype(np.float32)
    return out


def load_npz_batch(paths: Sequence[str], member: str, shape,
                   n_threads: Optional[int] = None) -> np.ndarray:
    """Load member ``member`` from N same-shaped .npz archives (stored or
    deflate) into one (N, *shape) float32 array."""
    lib = _load_lib()
    n = len(paths)
    elems = int(np.prod(shape))
    out = np.empty((n,) + tuple(shape), np.float32)
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = np.load(p)[member].astype(np.float32)
        return out
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nt = n_threads or min(os.cpu_count() or 8, 16)
    rc = lib.dpc_load_npz_batch(
        c_paths, member.encode(), n, nt,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), elems)
    if rc != 0:
        for i, p in enumerate(paths):
            out[i] = np.load(p)[member].astype(np.float32)
    return out
