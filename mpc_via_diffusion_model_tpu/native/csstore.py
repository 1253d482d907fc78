"""ctypes binding for the csstore C++ shard store (see csstore.cpp).

Zero-copy dataset IO: `read_store` returns numpy arrays that VIEW the
mmap'd file (no deserialization, page-cache backed across epochs) — the
native replacement for the reference's torch.save/torch.load dataset path
and the `data_concatenate.py` shard-merging script.

The shared library is compiled on first use with g++ (the image ships the
toolchain but not pybind11; the C ABI + ctypes keeps the binding
dependency-free).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csstore.cpp")
_SO = os.path.join(_HERE, "libcsstore.so")

_DTYPES = {0: np.float32, 1: np.int32, 2: np.int64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1, np.dtype(np.int64): 2}

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise RuntimeError(f"csstore unavailable: {_build_error}")
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception as e:  # toolchain missing: degrade loudly but once
            _build_error = str(e)
            raise RuntimeError(f"csstore unavailable: {e}") from e

        lib.css_write.restype = ctypes.c_int
        lib.css_open.restype = ctypes.c_void_p
        lib.css_open.argtypes = [ctypes.c_char_p]
        lib.css_n_tensors.restype = ctypes.c_int32
        lib.css_n_tensors.argtypes = [ctypes.c_void_p]
        lib.css_name.restype = ctypes.c_char_p
        lib.css_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.css_dtype.restype = ctypes.c_uint32
        lib.css_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.css_ndim.restype = ctypes.c_int32
        lib.css_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.css_dims.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
        lib.css_data.restype = ctypes.c_void_p
        lib.css_data.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.css_close.argtypes = [ctypes.c_void_p]
        lib.css_concat.restype = ctypes.c_int
        _lib = lib
        return lib


def csstore_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def write_store(path: str, tensors: Dict[str, np.ndarray]) -> None:
    lib = _load()
    names = list(tensors.keys())
    arrays = [np.ascontiguousarray(tensors[k]) for k in names]
    for a in arrays:
        if a.dtype not in _DTYPE_CODES:
            raise TypeError(f"unsupported dtype {a.dtype}; use f32/i32/i64")
    n = len(names)
    c_names = (ctypes.c_char_p * n)(*[s.encode() for s in names])
    c_dtypes = (ctypes.c_uint32 * n)(*[_DTYPE_CODES[a.dtype] for a in arrays])
    c_ndims = (ctypes.c_int32 * n)(*[a.ndim for a in arrays])
    dims_flat = [d for a in arrays for d in a.shape]
    c_dims = (ctypes.c_int64 * len(dims_flat))(*dims_flat)
    c_data = (ctypes.c_void_p * n)(*[a.ctypes.data_as(ctypes.c_void_p).value for a in arrays])
    rc = lib.css_write(path.encode(), n, c_names, c_dtypes, c_ndims, c_dims, c_data)
    if rc != 0:
        raise IOError(f"css_write failed with code {rc} for {path}")


class _StoreHandle:
    """Owns the mmap; closed when the LAST referencing array dies (every
    returned array holds a reference via the `_MappedArray` subclass)."""

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib

    def __del__(self):
        try:
            if self._handle:
                self._lib.css_close(self._handle)
                self._handle = None
        except Exception:
            pass


class _MappedArray(np.ndarray):
    """ndarray view over the mmap that keeps the store handle alive.

    Without this, `arr = read_store(p)['x']` would let the dict (and the
    mmap) be garbage-collected while `arr` still points into the unmapped
    pages -> SIGSEGV on the next read."""

    _store: "_StoreHandle" = None

    def __array_finalize__(self, obj):
        if obj is not None:
            self._store = getattr(obj, "_store", None)


def read_store(path: str) -> Dict[str, np.ndarray]:
    """Open a store; values are zero-copy numpy views over the mmap. Each
    array keeps the mapping alive for its own lifetime."""
    lib = _load()
    h = lib.css_open(path.encode())
    if not h:
        raise IOError(f"css_open failed for {path}")
    store = _StoreHandle(h, lib)
    out: Dict[str, np.ndarray] = {}
    n = lib.css_n_tensors(h)
    for i in range(n):
        name = lib.css_name(h, i).decode()
        dtype = _DTYPES[lib.css_dtype(h, i)]
        ndim = lib.css_ndim(h, i)
        dims = (ctypes.c_int64 * ndim)()
        lib.css_dims(h, i, dims)
        shape = tuple(dims)
        ptr = lib.css_data(h, i)
        size = int(np.prod(shape)) * np.dtype(dtype).itemsize
        buf = (ctypes.c_char * size).from_address(ptr)
        arr = np.frombuffer(buf, dtype=dtype).reshape(shape).view(_MappedArray)
        arr._store = store
        arr.flags.writeable = False
        out[name] = arr
    return out


def concat_stores(paths: Sequence[str], out_path: str) -> None:
    """Stack same-name tensors from shards along axis 0 (the native
    replacement for `data_concatenate.py`)."""
    lib = _load()
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.css_concat(c_paths, n, out_path.encode())
    if rc != 0:
        raise IOError(f"css_concat failed with code {rc}")
