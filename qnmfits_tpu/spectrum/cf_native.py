"""ctypes binding for the native Leaver-CF kernel (csrc/cf_kernel.cpp).

Compiles on first use with g++ (cached as libcf_kernel.so next to the
source).  Falls back to the NumPy implementation when no compiler is
available, so the package works everywhere; the native path is ~100x
faster and is used by the offline table builder.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC_DIR = Path(__file__).parent / "csrc"
_LIB_PATH = _SRC_DIR / "libcf_kernel.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = _SRC_DIR / "cf_kernel.cpp"
    try:
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(_LIB_PATH), str(src)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.radial_cf_batch.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.radial_cf_batch.restype = None
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def radial_cf_batch(omega, a, A, s: int, m: int, n_inv, N: int):
    """Native batched CF evaluation.

    omega, A : complex arrays (B,);  a : float array (B,) in Leaver units;
    n_inv : int array (B,).  Returns complex (B,).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native CF kernel unavailable")
    omega = np.ascontiguousarray(omega, dtype=complex)
    B = omega.shape[0]
    a = np.ascontiguousarray(np.broadcast_to(a, (B,)), dtype=np.float64)
    A = np.ascontiguousarray(np.broadcast_to(A, (B,)), dtype=complex)
    n_inv = np.ascontiguousarray(
        np.broadcast_to(n_inv, (B,)), dtype=np.int32)
    out_re = np.empty(B)
    out_im = np.empty(B)
    lib.radial_cf_batch(
        B,
        np.ascontiguousarray(omega.real), np.ascontiguousarray(omega.imag),
        a,
        np.ascontiguousarray(A.real), np.ascontiguousarray(A.imag),
        s, m, n_inv, N, out_re, out_im)
    return out_re + 1j * out_im
