"""ctypes bindings for the native host runtime (native/bagio.cpp):
threaded ragged-bag padding, f32->bf16 conversion, parallel file reads.

The shared library is built on demand with g++ (no pybind11 in this
image); every entry point has a pure-numpy fallback so the framework
works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "bagio.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libbagio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             "-o", _LIB, _SRC], check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (os.path.exists(_LIB) and os.path.exists(_SRC)
                 and os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if (not os.path.exists(_LIB) or stale) and os.path.exists(_SRC):
            if not _build() and not os.path.exists(_LIB):
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mmf_pad_bags_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.mmf_f32_to_bf16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.mmf_read_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int]
        lib.mmf_read_files.restype = ctypes.c_int64
        if hasattr(lib, "mmf_jpeg_lossless_decode"):  # absent in old .so
            lib.mmf_jpeg_lossless_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            lib.mmf_jpeg_lossless_decode.restype = ctypes.c_int
        _lib = lib
        return _lib


_buffer_pool: dict = {}


def pad_bags_native(bags: List[Optional[np.ndarray]], n_pad: int,
                    feat_dim: int, n_threads: int = 0,
                    reuse_buffers: bool = False):
    """Threaded C++ pad/stack; returns (out [B, n_pad, D] f32,
    mask [B, n_pad] f32) or None when the library is unavailable or an
    input is not float32-contiguous.

    ``reuse_buffers=True`` serves the output from a per-shape buffer pool
    — the page-fault cost of fresh 100s-of-MB batches dominates the
    memcpy otherwise.  Only safe when the caller consumes (e.g. device-
    transfers) the batch before the next call with the same shape.
    """
    lib = get_lib()
    if lib is None:
        return None
    B = len(bags)
    ptrs = (ctypes.c_void_p * B)()
    lens = (ctypes.c_int64 * B)()
    keepalive = []
    for i, b in enumerate(bags):
        if b is None or b.shape[0] == 0:
            ptrs[i], lens[i] = None, 0
            continue
        if (b.ndim != 2 or b.dtype != np.float32
                or not b.flags.c_contiguous or b.shape[1] != feat_dim):
            return None
        keepalive.append(b)
        ptrs[i] = b.ctypes.data_as(ctypes.c_void_p)
        lens[i] = b.shape[0]
    key = (B, n_pad, feat_dim)
    if reuse_buffers and key in _buffer_pool:
        out, mask = _buffer_pool[key]
    else:
        out = np.empty((B, n_pad, feat_dim), np.float32)
        mask = np.empty((B, n_pad), np.float32)
        if reuse_buffers:
            _buffer_pool[key] = (out, mask)
    lib.mmf_pad_bags_f32(ptrs, lens, B, n_pad, feat_dim,
                         out.ctypes.data_as(ctypes.c_void_p),
                         mask.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out, mask


def f32_to_bf16(x: np.ndarray, n_threads: int = 0) -> Optional[np.ndarray]:
    """Round-to-nearest-even f32 -> bf16 (as uint16 view reinterpreted by
    jax/ml_dtypes); None when unavailable."""
    lib = get_lib()
    if lib is None or x.dtype != np.float32 or not x.flags.c_contiguous:
        return None
    out = np.empty(x.shape, np.uint16)
    lib.mmf_f32_to_bf16(x.ctypes.data_as(ctypes.c_void_p),
                        out.ctypes.data_as(ctypes.c_void_p), x.size,
                        n_threads)
    import ml_dtypes
    return out.view(ml_dtypes.bfloat16)


def jpeg_lossless_decode(entropy: bytes, counts: bytes, symbols: bytes,
                         rows: int, cols: int, psv: int,
                         default_pred: int) -> Optional[np.ndarray]:
    """C++ T.81 process-14 entropy decode + prediction (the per-pixel
    loop data/dicom.py would otherwise run in Python). Returns uint16
    (rows, cols) WITHOUT the point transform applied, or None when the
    library is unavailable or the stream is malformed (the caller's
    pure-Python path then raises the precise error)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mmf_jpeg_lossless_decode"):
        return None
    out = np.empty((rows, cols), np.uint16)
    rc = lib.mmf_jpeg_lossless_decode(
        entropy, len(entropy), bytes(counts), bytes(symbols),
        rows, cols, psv, default_pred,
        out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def read_files(paths: List[str], sizes: List[int], n_threads: int = 0):
    """Parallel whole-file reads; returns list of bytearrays (or None)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    bufs = [np.empty(s, np.uint8) for s in sizes]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_sizes = (ctypes.c_int64 * n)(*sizes)
    c_bufs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p) for b in bufs])
    ok = lib.mmf_read_files(c_paths, c_sizes, c_bufs, n, n_threads)
    if ok != n:
        return None
    return bufs
