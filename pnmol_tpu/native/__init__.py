"""Native (C++) host components, bound through ctypes.

Currently: the k-NN stencil-search engine (``knn.cpp``), compiled on first
use with the system toolchain and cached next to the source. Falls back to
pure NumPy if no compiler is available — callers never need to care.
"""

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent / "knn.cpp"
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build_dir() -> pathlib.Path:
    cache = pathlib.Path(
        os.environ.get("PNMOL_TPU_NATIVE_CACHE", pathlib.Path.home() / ".cache" / "pnmol_tpu")
    )
    cache.mkdir(parents=True, exist_ok=True)
    return cache


def _compile() -> pathlib.Path | None:
    source = _SRC.read_text()
    tag = hashlib.sha256(source.encode()).hexdigest()[:16]
    out = _build_dir() / f"libknn_{tag}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        str(_SRC), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return out
    except Exception:
        # retry without OpenMP (single-threaded queries)
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=240)
            return out
        except Exception:
            return None


def _load():
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _compile()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(str(path))
        lib.pnmol_knn_query.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pnmol_knn_query.restype = None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def knn(points: np.ndarray, queries: np.ndarray, k: int):
    """k nearest neighbors: (indices (q, k), distances (q, k)), nearest first.

    Uses the native KD-tree when the extension builds; NumPy brute force
    otherwise.
    """
    points = np.ascontiguousarray(points, dtype=np.float64)
    queries = np.ascontiguousarray(queries, dtype=np.float64)
    n, dim = points.shape
    q = queries.shape[0]
    k = min(k, n)

    lib = _load()
    if lib is None:
        d2 = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
        idx = np.argpartition(d2, kth=k - 1, axis=1)[:, :k]
        order = np.take_along_axis(d2, idx, axis=1).argsort(axis=1)
        idx = np.take_along_axis(idx, order, axis=1)
        dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))
        return idx.astype(np.int32), dist

    indices = np.empty((q, k), dtype=np.int32)
    distances = np.empty((q, k), dtype=np.float64)
    lib.pnmol_knn_query(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        ctypes.c_int64(dim),
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(q),
        ctypes.c_int64(k),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        distances.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return indices, distances
