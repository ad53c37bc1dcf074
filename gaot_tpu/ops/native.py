"""ctypes loader/builder for the native C++ host kernels (cpp/*.cc).

Compiles the shared library on first use with g++ (cached by source mtime) and
exposes thin NumPy wrappers: fixed-radius neighbor search
(cpp/neighbor_search.cc) and the multi-threaded batch row gather
(cpp/batch_gather.cc). If no compiler is available the callers fall back to
pure-Python/NumPy implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRCS = [os.path.join(_REPO_ROOT, "cpp", f)
         for f in ("neighbor_search.cc", "batch_gather.cc")]
_SRC = _SRCS[0]
_BUILD_DIR = os.path.join(_REPO_ROOT, "cpp", "_build")
_SO = os.path.join(_BUILD_DIR, "libgaot_native.so")

_lock = threading.Lock()
_lib_wrapper = None
_load_attempted = False


class NativeLib:
    def __init__(self, cdll: ctypes.CDLL):
        self._lib = cdll
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        self._lib.gaot_radius_count.restype = ctypes.c_int
        self._lib.gaot_radius_count.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_float, i64p,
        ]
        self._lib.gaot_radius_fill.restype = ctypes.c_int
        self._lib.gaot_radius_fill.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_float, i64p, i64p,
        ]
        self._lib.gaot_knn.restype = ctypes.c_int
        self._lib.gaot_knn.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int64, i64p,
        ]
        self._lib.gaot_gather_rows.restype = ctypes.c_int
        self._lib.gaot_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]

    def radius_search(self, data: np.ndarray, queries: np.ndarray,
                      radius: float) -> Tuple[np.ndarray, np.ndarray]:
        assert data.dtype == np.float32 and queries.dtype == np.float32
        n, dim = data.shape
        q = queries.shape[0]
        counts = np.zeros(q, dtype=np.int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        dp = data.ctypes.data_as(f32p)
        qp = queries.ctypes.data_as(f32p)
        rc = self._lib.gaot_radius_count(
            dp, n, qp, q, dim, radius, counts.ctypes.data_as(i64p))
        if rc != 0:
            raise RuntimeError(f"gaot_radius_count failed with code {rc}")
        row_splits = np.zeros(q + 1, dtype=np.int64)
        np.cumsum(counts, out=row_splits[1:])
        index = np.zeros(int(row_splits[-1]), dtype=np.int64)
        rc = self._lib.gaot_radius_fill(
            dp, n, qp, q, dim, radius,
            row_splits.ctypes.data_as(i64p), index.ctypes.data_as(i64p))
        if rc != 0:
            raise RuntimeError(f"gaot_radius_fill failed with code {rc}")
        return index, row_splits

    def knn_search(self, data: np.ndarray, queries: np.ndarray,
                   k: int) -> np.ndarray:
        """[q, k] indices of the k nearest data points per query, each row
        sorted by (distance, index). Requires 1 <= k <= len(data)."""
        assert data.dtype == np.float32 and queries.dtype == np.float32
        n, dim = data.shape
        q = queries.shape[0]
        out = np.empty((q, int(k)), dtype=np.int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        rc = self._lib.gaot_knn(
            data.ctypes.data_as(f32p), n, queries.ctypes.data_as(f32p), q,
            dim, int(k), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc != 0:
            raise RuntimeError(f"gaot_knn failed with code {rc}")
        return out

    def gather_rows(self, src: np.ndarray, idx: np.ndarray,
                    num_threads: int = 0) -> np.ndarray:
        """out[i] = src[idx[i]] over the leading axis (multi-threaded memcpy)."""
        assert src.flags["C_CONTIGUOUS"]
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        out = np.empty((idx.shape[0],) + src.shape[1:], dtype=src.dtype)
        row_bytes = src.strides[0] if src.ndim > 1 else src.itemsize
        rc = self._lib.gaot_gather_rows(
            src.ctypes.data_as(ctypes.c_void_p), src.shape[0], row_bytes,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0], out.ctypes.data_as(ctypes.c_void_p), num_threads)
        if rc == 2:
            raise IndexError(
                f"gather_rows: index out of range for {src.shape[0]} rows")
        if rc != 0:
            raise RuntimeError(f"gaot_gather_rows failed with code {rc}")
        return out


def take_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Gather rows over the leading axis, using the native multi-threaded
    path for large copies and NumPy otherwise."""
    lib = get_native_lib()
    if (lib is not None and src.flags["C_CONTIGUOUS"]
            and src.nbytes // max(len(src), 1) * len(idx) >= (4 << 20)):
        return lib.gather_rows(src, idx)
    return src[idx]


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", _SO, *_SRCS,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def get_native_lib() -> Optional[NativeLib]:
    """Return the loaded native library, building it if needed; None if unavailable."""
    global _lib_wrapper, _load_attempted
    with _lock:
        if _load_attempted:
            return _lib_wrapper
        _load_attempted = True
        if not all(os.path.exists(s) for s in _SRCS):
            return None
        stale = (not os.path.exists(_SO)
                 or any(os.path.getmtime(_SO) < os.path.getmtime(s)
                        for s in _SRCS))
        if stale and not _build():
            return None
        try:
            _lib_wrapper = NativeLib(ctypes.CDLL(_SO))
        except (OSError, AttributeError):
            # AttributeError: a stale cached .so missing newer symbols (e.g.
            # built before batch_gather.cc existed with equal mtimes) —
            # rebuild once, else fall back to the pure-Python paths.
            _lib_wrapper = None
            if _build():
                try:
                    _lib_wrapper = NativeLib(ctypes.CDLL(_SO))
                except (OSError, AttributeError):
                    _lib_wrapper = None
        return _lib_wrapper
