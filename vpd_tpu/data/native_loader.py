"""ctypes binding for the native crop decoder (native/crop_loader.cpp).

TPU-native equivalent of the reference's DataLoader worker processes
(`train_vpd_model.py:205-212`, `apply_vpd_model.py:154-157`): the host hot
loop there is per-sample PNG decode + resize in forked Python workers.
Here ONE ctypes call decodes a whole uint8 batch in a C++ thread pool
(libpng); the GIL is released for the duration, so decode overlaps the
Python sampler and the device step. Built on demand with g++ like the
DTW core (`ops/dtw_native.py`); everything falls back to the per-image
cv2/PIL path in `data/crops.py` when no toolchain or libpng is present.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.realpath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'crop_loader.cpp')
_LIB_PATH = os.path.join(_REPO_ROOT, 'native', 'libvpdloader.so')

_lib = None
_lib_failed = False


def _build():
    from ..ops.dtw_native import build_locked
    # fp-contract=off: vpd_yuv420_pack must match the numpy encoder
    # bit for bit (FMA contraction under -march=native would skew the
    # float32 luma/chroma sums by 1 ULP around rounding boundaries)
    build_locked(_SRC, _LIB_PATH,
                 extra_flags=['-lpng', '-lz', '-pthread',
                              '-ffp-contract=off'])


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        _lib_failed = True
        return None
    lib.vpd_decode_crops.restype = ctypes.c_int64
    lib.vpd_decode_crops.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8)]
    for pack_fn in ('vpd_yuv420_pack', 'vpd_luma_pack'):
        if hasattr(lib, pack_fn):  # absent in pre-round-4 builds
            fn = getattr(lib, pack_fn)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def available():
    return get_lib() is not None


def _paths_arg(paths):
    if paths is None:
        return None
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    return ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p))


def _buf_arg(arr):
    if arr is None:
        return None
    assert arr.dtype == np.uint8 and arr.flags['C_CONTIGUOUS']
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_crops(rgb_paths, img_dim, *, flow_paths=None, mask_paths=None,
                 rgb_out=None, flow_out=None, mask_out=None,
                 n_threads=None):
    """Decode a batch of crop PNGs into uint8 arrays with the C++ pool.

    Byte-compatible with the cv2 host path: rgb in RGB order, flow in raw
    cv2 (BGR) order with flow consumers reading channels [0, 1], mask as
    the single gray channel (missing masks zero-fill silently). Raises on
    a missing/corrupt rgb or flow file, like the cv2 path would.

    Returns (rgb, flow_or_None, mask_or_None); `*_out` arrays, when given,
    are filled in place (rows past len(paths) untouched) and returned.
    """
    lib = get_lib()
    assert lib is not None, 'native crop loader unavailable'
    n = len(rgb_paths)
    if rgb_out is None:
        rgb_out = np.empty((n, img_dim, img_dim, 3), np.uint8)
    if flow_paths is not None and flow_out is None:
        flow_out = np.empty((n, img_dim, img_dim, 3), np.uint8)
    if mask_paths is not None and mask_out is None:
        mask_out = np.empty((n, img_dim, img_dim), np.uint8)
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    assert flow_paths is None or len(flow_paths) == n
    assert mask_paths is None or len(mask_paths) == n
    failures = lib.vpd_decode_crops(
        _paths_arg(rgb_paths), _paths_arg(flow_paths),
        _paths_arg(mask_paths), n, img_dim, n_threads,
        _buf_arg(rgb_out),
        _buf_arg(flow_out if flow_paths is not None else None),
        _buf_arg(mask_out if mask_paths is not None else None))
    if failures:
        raise IOError(
            '{} crop/flow PNGs failed to decode'.format(failures))
    return (rgb_out,
            flow_out if flow_paths is not None else None,
            mask_out if mask_paths is not None else None)


def yuv420_pack(rgb, n_threads=None):
    """Pack (B, H, W, 3) uint8 RGB into (B, H*W*3//2) YUV 4:2:0 planes
    with the native single-pass packer (GIL released; bit-exact with
    `data.upload_codec.encode_yuv420_numpy`)."""
    lib = get_lib()
    assert lib is not None and hasattr(lib, 'vpd_yuv420_pack'), \
        'native yuv420 packer unavailable'
    rgb = np.ascontiguousarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 4 and rgb.shape[-1] == 3
    b, h, w, _ = rgb.shape
    assert h % 2 == 0 and w % 2 == 0, 'yuv420 needs even dims'
    out = np.empty((b, h * w + 2 * (h // 2) * (w // 2)), np.uint8)
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    rc = lib.vpd_yuv420_pack(_buf_arg(rgb), b, h, w, n_threads,
                             _buf_arg(out))
    assert rc == 0, rc
    return out


def luma_pack(rgb, n_threads=None):
    """Pack (B, H, W, 3) uint8 RGB into (B, H*W) uint8 Y planes (the y8
    upload codec; bit-exact with yuv420_pack's Y plane, ~1/3 the work,
    no even-dim requirement)."""
    lib = get_lib()
    assert lib is not None and hasattr(lib, 'vpd_luma_pack'), \
        'native luma packer unavailable'
    rgb = np.ascontiguousarray(rgb)
    assert rgb.dtype == np.uint8 and rgb.ndim == 4 and rgb.shape[-1] == 3
    b, h, w, _ = rgb.shape
    out = np.empty((b, h * w), np.uint8)
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    rc = lib.vpd_luma_pack(_buf_arg(rgb), b, h, w, n_threads,
                           _buf_arg(out))
    assert rc == 0, rc
    return out
