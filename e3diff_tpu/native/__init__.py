"""Native (C++) compute kernels for the host-side data pipeline.

The reference's preprocessing leans on the external `dssp` binary for its
per-structure geometry (clean_data/data_preprocessing.py:746-769); this
package is the rebuild's native equivalent. `dssp_core.cpp` holds the two
hot loops of the DSSP feature extraction (Kabsch-Sander H-bond pair scan,
Shrake-Rupley accessibility); data/dssp.py dispatches to them when the
library is available and falls back to its pure-numpy implementations
otherwise (same element order, values within 1e-12 — the difference is
BLAS rounding in numpy's norm; tests/test_native_kernels.py).

The shared library is compiled on first use with g++ (-O3, position
independent) and cached next to the source keyed by a source hash, so a
source edit triggers a rebuild and a stale cache is never loaded. Set
``E3DIFF_NATIVE=0`` to force the numpy path (e.g. on hosts without a C++
toolchain the fallback is automatic, the flag just makes it explicit).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import warnings

_SRC = os.path.join(os.path.dirname(__file__), "dssp_core.cpp")
_LIB = None
_TRIED = False


def _cache_dir() -> str:
    root = os.environ.get("E3DIFF_NATIVE_CACHE")
    if not root:
        root = os.path.join(
            os.path.expanduser("~"), ".cache", "e3diff_tpu", "native")
    os.makedirs(root, exist_ok=True)
    return root


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"dssp_core-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)  # atomic under concurrent builders
    return so_path


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ks_hbond_scan.restype = ctypes.c_int
    lib.ks_hbond_scan.argtypes = [
        f64p, f64p, f64p, f64p, f64p, u8p, ctypes.c_int,
        i32p, i32p, f64p, ctypes.c_int]
    lib.shrake_rupley.restype = None
    lib.shrake_rupley.argtypes = [
        f64p, f64p, i32p, ctypes.c_int, f64p, ctypes.c_int,
        f64p, ctypes.c_int]
    return lib


def load_native_lib():
    """The compiled kernel library, or None when disabled/unbuildable.
    Builds at most once per process; failure warns once and is final."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("E3DIFF_NATIVE", "1") == "0":
        return None
    try:
        _LIB = _bind(ctypes.CDLL(_build()))
    except Exception as e:  # missing g++, sandboxed fs, bad cache, ...
        warnings.warn(
            f"e3diff_tpu.native: C++ kernel build/load failed ({e!r}); "
            "preprocessing falls back to the pure-numpy engine.",
            stacklevel=2)
        _LIB = None
    return _LIB


def as_f64(arr):
    import numpy as np
    a = np.ascontiguousarray(arr, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def as_i32(arr):
    import numpy as np
    a = np.ascontiguousarray(arr, dtype=np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def as_u8(arr):
    import numpy as np
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
