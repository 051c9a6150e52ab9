"""ctypes binding for the native DTW core (native/dtw_core.cpp).

Replaces the reference's `dtw-python` compiled core. The library is built
on demand with g++ into the package build dir; if no toolchain is present
everything falls back to the pure-numpy implementation in `ops/dtw.py`.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.realpath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'dtw_core.cpp')
_LIB_PATH = os.path.join(_REPO_ROOT, 'native', 'libvpddtw.so')

_STEP_IDS = {'symmetric2': 0, 'symmetricP2': 1}

_lib = None


def build_locked(src, lib_path, extra_flags=()):
    """Race-safe on-demand g++ build shared by the native bindings.

    Worker processes (data/parallel_batcher.py) may all find the library
    missing at once: an exclusive flock serializes the compile, the
    output lands in a pid-unique temp file, and os.replace publishes it
    atomically so a concurrent dlopen never sees a half-written .so.
    """
    import fcntl

    lock_path = lib_path + '.lock'
    with open(lock_path, 'w') as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if os.path.exists(lib_path) and (
                    os.path.getmtime(lib_path) >= os.path.getmtime(src)):
                return  # another process built it while we waited
            tmp = '{}.tmp.{}'.format(lib_path, os.getpid())
            subprocess.check_call(
                ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                 '-o', tmp, src] + list(extra_flags))
            os.replace(tmp, lib_path)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _build():
    build_locked(_SRC, _LIB_PATH)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        return None

    lib.vpd_dtw_from_costs.restype = ctypes.c_double
    lib.vpd_dtw_from_costs.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32]
    lib.vpd_dtw_from_seqs.restype = ctypes.c_double
    lib.vpd_dtw_from_seqs.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32]
    _lib = lib
    return _lib


def available():
    return get_lib() is not None


def _as_c(x):
    x = np.ascontiguousarray(x, dtype=np.float64)
    return x, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def dtw_distance_native(d, step_pattern='symmetricP2', normalized=True):
    """DTW of a precomputed (N, M) cost matrix via the native core."""
    lib = get_lib()
    assert lib is not None
    d, ptr = _as_c(d)
    return lib.vpd_dtw_from_costs(
        ptr, d.shape[0], d.shape[1], _STEP_IDS[step_pattern],
        int(normalized))


def dtw_seq_distance_native(a, b, step_pattern='symmetricP2',
                            normalized=True):
    """Fused pairwise-L2 + DTW of two (T, D) sequences."""
    lib = get_lib()
    assert lib is not None
    a, pa = _as_c(a)
    b, pb = _as_c(b)
    assert a.shape[1] == b.shape[1]
    return lib.vpd_dtw_from_seqs(
        pa, a.shape[0], pb, b.shape[0], a.shape[1],
        _STEP_IDS[step_pattern], int(normalized))


def build_native_dtw_fn(step_pattern='symmetricP2'):
    """Drop-in for ops.dtw.build_dtw_distance_fn using the native core."""
    def fn(a, b):
        return dtw_seq_distance_native(a, b, step_pattern)
    return fn
