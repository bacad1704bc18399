"""ctypes bindings for the native runtime (auto-built, NumPy fallback).

The shared library is compiled on first use with g++ (no pip deps). If the
toolchain is unavailable the pure-NumPy implementations in
utils/connectivity.py are used instead -- same results, slower at scale.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "connectivity.cpp")
_LIB = os.path.join(_HERE, "_dmrt_native.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                try:
                    # build to a private temp name and os.replace() it in:
                    # atomic on POSIX, so a concurrent process can never
                    # dlopen a half-written library
                    tmp = f"{_LIB}.build.{os.getpid()}"
                    subprocess.run(
                        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                         "-o", tmp, _SRC],
                        check=True, capture_output=True,
                    )
                    os.replace(tmp, _LIB)
                except Exception:
                    # stale-but-loadable library (or read-only install /
                    # missing toolchain): fall through to CDLL if a built
                    # .so exists rather than silently dropping to NumPy
                    if not os.path.exists(_LIB):
                        raise
            lib = ctypes.CDLL(_LIB)
            fn = lib.dmrt_build_tet_connectivity
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def build_tet_connectivity(tets: np.ndarray):
    """Native-accelerated connectivity build; see utils/connectivity.py."""
    lib = _load()
    tets = np.ascontiguousarray(tets, np.int32)
    if lib is None:
        from ..utils.connectivity import build_tet_connectivity as np_build
        return np_build(tets)

    T = tets.shape[0]
    faces = np.empty((4 * T, 3), np.int32)
    face_tets = np.empty((4 * T, 2), np.int32)
    tet_faces = np.empty((T, 4), np.int32)
    F = lib.dmrt_build_tet_connectivity(T, tets, faces, face_tets, tet_faces)
    if F < 0:
        raise ValueError("non-manifold tessellation: face shared by >2 tets")
    return faces[:F].copy(), face_tets[:F].copy(), tet_faces
