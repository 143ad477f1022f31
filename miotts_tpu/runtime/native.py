"""ctypes bindings for the native runtime library (with pure-Python fallback).

The compute path is JAX/XLA on TPU; this covers host hot paths in C++
(threaded GGUF dequantization at model load, WAV encode, resampling) —
the runtime-native counterpart to the reference's C++ host code. Falls back
silently to the numpy implementations when no compiler/library is available.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "native" / "libmiotts_runtime.so"
_lib = None
_tried = False

# GGML types the native dequant supports (ids match gguf.quants.GGMLType)
NATIVE_DEQUANT_TYPES = {0, 1, 2, 8, 14, 30}


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MIOTTS_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists():
        try:
            from .build_native import build

            build(verbose=False)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.mio_dequant.restype = ctypes.c_int
        lib.mio_dequant.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int,
        ]
        lib.mio_encode_wav16.restype = ctypes.c_int
        lib.mio_encode_wav16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p]
        lib.mio_resample_linear.restype = ctypes.c_int
        lib.mio_resample_linear.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64]
        lib.mio_resample_linear_len.restype = ctypes.c_int64
        lib.mio_resample_linear_len.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.mio_runtime_abi_version.restype = ctypes.c_int
        if lib.mio_runtime_abi_version() != 1:
            return None
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def dequantize_native(raw: np.ndarray, ggml_type: int, n_elements: int,
                      n_threads: int = 0) -> np.ndarray | None:
    """Threaded native dequantization; None if unavailable/unsupported."""
    lib = _load()
    if lib is None or int(ggml_type) not in NATIVE_DEQUANT_TYPES:
        return None
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    raw = np.ascontiguousarray(raw)
    out = np.empty(n_elements, np.float32)
    rc = lib.mio_dequant(int(ggml_type), raw.ctypes.data, out.ctypes.data,
                         n_elements, n_threads)
    return out if rc == 0 else None


def encode_wav16_native(audio: np.ndarray, sample_rate: int) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    out = np.empty(44 + 2 * audio.size, np.uint8)
    rc = lib.mio_encode_wav16(audio.ctypes.data, audio.size, sample_rate,
                              out.ctypes.data)
    return out.tobytes() if rc == 0 else None


def resample_linear_native(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    if x.size == 0 or sr_in == sr_out:
        return x
    n_out = lib.mio_resample_linear_len(x.size, sr_in, sr_out)
    out = np.empty(n_out, np.float32)
    rc = lib.mio_resample_linear(x.ctypes.data, x.size, sr_in, sr_out,
                                 out.ctypes.data, n_out)
    return out if rc == 0 else None
