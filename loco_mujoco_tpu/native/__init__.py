"""Native (C++) host-runtime components, loaded via ctypes.

The reference delegates all native compute to the external MuJoCo C
library; its own data-loading hot spot — cubic dataset resampling,
reference utils/trajectory.py:184-234 — is pure scipy. Here that loader
runs in C++ (OpenMP over rows, see src/resample.cpp), built on demand
with g++ and cached next to the source. scipy remains the fallback (and
the parity oracle in tests/test_native.py), so the package works without
a toolchain: `cubic_resample_uniform` returns None if unavailable and
callers fall back.

Set LMT_NATIVE=0 to disable native paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "resample.cpp")
_LIB = os.path.join(_HERE, "src", "_resample.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", _LIB,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without -march/-fopenmp for maximum portability
            r = subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
                capture_output=True, timeout=120,
            )
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("LMT_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.cubic_resample_uniform.restype = ctypes.c_int
        lib.cubic_resample_uniform.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def cubic_resample_uniform(y, x_new):
    """Not-a-knot cubic-spline resample of rows of y (uniform knots
    0..T-1), equal to scipy.interpolate.interp1d(kind="cubic"). y is
    (..., T); x_new is (K,) in [0, T-1]. Returns (..., K) float64, or
    None when the native library is unavailable (caller falls back to
    scipy)."""
    lib = _load()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float64)
    x_new = np.ascontiguousarray(x_new, dtype=np.float64)
    lead = y.shape[:-1]
    n = y.shape[-1]
    if n < 4:
        return None
    rows = int(np.prod(lead, dtype=np.int64)) if lead else 1
    y2 = y.reshape(rows, n)
    out = np.empty((rows, len(x_new)), dtype=np.float64)
    rc = lib.cubic_resample_uniform(
        y2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), rows, n,
        x_new.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x_new),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return out.reshape(*lead, len(x_new))
