"""ctypes bindings for the native PNG codec / resize / batch decoder.

Auto-builds ``libpai_native.so`` with make on first import if the toolchain
is present; raises ImportError otherwise so callers fall back to PIL
(pai_tpu/utils/images.py, pai_tpu/data/pipeline.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpai_native.so")


def _build() -> None:
    subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                   capture_output=True)


# Always invoke make: it is mtime-incremental, so this is a no-op when the
# library is current but rebuilds automatically when png_codec.cc gains new
# symbols (a stale cached .so would otherwise fail the ctypes binding below
# and silently disable the whole native fast path).
try:
    _build()
except Exception:
    if not os.path.exists(_SO):
        raise

_lib = ctypes.CDLL(_SO)

_lib.pai_read_png_gray.restype = ctypes.c_int
_lib.pai_read_png_gray.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
_lib.pai_free.argtypes = [ctypes.c_void_p]
_lib.pai_write_png.restype = ctypes.c_int
_lib.pai_write_png.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_int]
_lib.pai_resize_aa.restype = ctypes.c_int
_lib.pai_resize_aa.argtypes = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
_lib.pai_decode_batch_u8.restype = ctypes.c_int
_lib.pai_decode_batch_u8.argtypes = [
    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]


def read_png_gray(path: str) -> np.ndarray:
    out = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = _lib.pai_read_png_gray(path.encode(), ctypes.byref(out),
                                ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"native PNG decode failed ({rc}): {path}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(h.value, w.value)).copy()
    finally:
        _lib.pai_free(out)
    return arr


def write_png(array: np.ndarray, path: str, compress_level: int = 0) -> None:
    arr = np.ascontiguousarray(array, dtype=np.uint8)
    if arr.ndim == 2:
        channels = 1
    elif arr.ndim == 3 and arr.shape[-1] in (1, 3):
        channels = arr.shape[-1]
        if channels == 1:
            arr = arr[..., 0]
    else:
        raise ValueError(f"unsupported PNG shape {arr.shape}")
    rc = _lib.pai_write_png(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.shape[0], arr.shape[1], channels, compress_level)
    if rc != 0:
        raise ValueError(f"native PNG write failed ({rc}): {path}")


def resize_bilinear_antialias(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 [H,W] -> float32 [dh,dw] in [0,1], triangle filter."""
    src = np.ascontiguousarray(img, dtype=np.uint8)
    dst = np.empty((dh, dw), np.float32)
    rc = _lib.pai_resize_aa(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw)
    if rc != 0:
        raise ValueError("native resize failed")
    # The kernel works in [0,1]; callers consume the [0,255] float scale.
    return dst * 255.0


def decode_batch_u8(paths, size: int, num_threads: int = 8):
    """Decode+resize a list of PNGs into [N, size, size, 1] uint8 (the
    torchvision semantics: antialiased resize rounded back to uint8)."""
    n = len(paths)
    out = np.zeros((n, size, size), np.uint8)
    failed = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    _lib.pai_decode_batch_u8(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    return out[..., None], failed.astype(bool)
