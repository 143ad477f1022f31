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
        lib.mio_runtime_abi_version.restype = ctypes.c_int
        abi = lib.mio_runtime_abi_version()
        if abi < 6:
            # stale library from an older checkout: rebuild once in place
            try:
                from .build_native import build

                build(verbose=False)
                lib = ctypes.CDLL(str(_LIB_PATH))
                lib.mio_runtime_abi_version.restype = ctypes.c_int
                abi = lib.mio_runtime_abi_version()
            except Exception:
                pass
        if abi < 1:
            return None
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
        if abi >= 2:  # int8 CPU decode kernels
            lib.mio_q8_quantize_act.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.mio_q8_gemv.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
            lib.mio_q8_gemv_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int]
            lib.mio_q8_row_dequant.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
        if abi >= 3:  # int4 (Q4_0) CPU decode kernels
            lib.mio_q4_gemv.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
            lib.mio_q4_gemv_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int]
            lib.mio_q4_row_dequant.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
        if abi >= 4:  # batched prompt-prefill gemm
            for f in (lib.mio_q8_gemm_f32, lib.mio_q4_gemm_f32):
                f.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        if abi >= 5:  # FLAC decode
            lib.mio_flac_probe.restype = ctypes.c_int
            lib.mio_flac_probe.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.mio_flac_decode.restype = ctypes.c_int
            lib.mio_flac_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p]
        if abi >= 6:  # mp3 (Layer III) decode
            lib.mio_mp3_probe.restype = ctypes.c_int
            lib.mio_mp3_probe.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.mio_mp3_decode.restype = ctypes.c_int
            lib.mio_mp3_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p]
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


def flac_decode_native(data: bytes) -> tuple[np.ndarray, int] | None:
    """Native FLAC stream decode -> (f32 mono, rate); None if the native
    library is unavailable or the stream fails to parse (callers fall back
    to the pure-Python decoder in runtime/flac.py)."""
    lib = _load()
    if lib is None or lib.mio_runtime_abi_version() < 5:
        return None
    buf = np.frombuffer(data, np.uint8)
    info = np.zeros(4, np.int64)
    if lib.mio_flac_probe(buf.ctypes.data, buf.size, info.ctypes.data) != 0:
        return None
    channels = int(info[1])
    cap = int(info[3]) or max(4096, buf.size * 4 // max(1, channels))
    for _ in range(8):  # total_samples may be 0 (unknown) — grow and retry
        out = np.empty(cap * channels, np.int32)
        rc = lib.mio_flac_decode(buf.ctypes.data, buf.size, out.ctypes.data,
                                 cap, info.ctypes.data)
        if rc == 0:
            n = int(info[3])
            rate = int(info[0])
            bps = int(info[2])
            x = out[: n * channels].reshape(n, channels).mean(axis=1)
            return (x / float(1 << (bps - 1))).astype(np.float32), rate
        if rc == -2:
            cap *= 4
            continue
        return None
    return None


def mp3_decode_native(data: bytes) -> tuple[np.ndarray, int] | None:
    """Native MPEG-1/2/2.5 Layer III decode -> (f32 mono, rate); None if
    disabled, the native library is unavailable, or the stream fails to
    parse (callers fall back to the numpy decoder in runtime/mp3.py).

    OPT-IN (MIOTTS_NATIVE_MP3=1): the in-process native decode was
    implicated in a flaky, heap-layout-sensitive SIGSEGV when the full
    test suite runs it alongside jax's compilation-cache reads (round-5
    notes; ASan/MALLOC_CHECK_ both come up clean in isolation, the crash
    vanishes with this path disabled and under MALLOC_CHECK_=3). The
    numpy decoder is bit-equivalent and fast enough for uploads
    (~10-20x realtime), so the default stays on the safe path; the
    native decoder remains covered by a subprocess cross-check test."""
    if os.environ.get("MIOTTS_NATIVE_MP3", "0") != "1":
        return None
    lib = _load()
    if lib is None or lib.mio_runtime_abi_version() < 6:
        return None
    buf = np.frombuffer(data, np.uint8)
    info = np.zeros(4, np.int64)
    if lib.mio_mp3_probe(buf.ctypes.data, buf.size, info.ctypes.data) != 0:
        return None
    cap = int(info[2]) or max(4096, buf.size * 16)
    for _ in range(8):
        out = np.empty(cap, np.float32)
        rc = lib.mio_mp3_decode(buf.ctypes.data, buf.size, out.ctypes.data,
                                cap, info.ctypes.data)
        if rc == 0:
            return out[: int(info[1])].copy(), int(info[0])
        if rc == -2:
            cap *= 4
            continue
        return None
    return None


# ---------------------------------------------------------------------------
# int8 CPU decode (local real-time text->speech; see miotts_runtime.cpp)
# ---------------------------------------------------------------------------

def q8_available() -> bool:
    lib = _load()
    return lib is not None and lib.mio_runtime_abi_version() >= 2


class Q8Gemv:
    """One Q8_0 weight matrix [N, K] (raw GGUF block bytes); y = W @ x per
    call. Thread-safe: the activation-quantization scratch is allocated
    per call (a few hundred bytes — noise next to the dot), so concurrent
    generations on a shared engine never corrupt each other's
    activations."""

    def __init__(self, raw: np.ndarray, n: int, k: int):
        assert k % 32 == 0, k
        self.raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
        assert self.raw.size == n * (k // 32) * 34, (self.raw.size, n, k)
        self.n = n
        self.k = k

    def __call__(self, x: np.ndarray, out: np.ndarray | None = None,
                 n_threads: int = 1) -> np.ndarray:
        lib = _load()
        x = np.ascontiguousarray(x, np.float32)
        y = out if out is not None else np.empty(self.n, np.float32)
        q = np.empty(self.k, np.int8)
        s = np.empty(self.k // 32, np.float32)
        lib.mio_q8_gemv_f32(self.raw.ctypes.data, x.ctypes.data,
                            self.n, self.k, y.ctypes.data,
                            q.ctypes.data, s.ctypes.data, n_threads)
        return y

    def gemm(self, x: np.ndarray, n_threads: int = 1) -> np.ndarray:
        """[B, K] @ W^T -> [B, N]: each weight row is read once for all B
        activation rows (batched prompt prefill — weight traffic per
        prompt token drops ~B-fold vs per-token gemv). Falls back to
        per-row gemv on a prebuilt abi<4 library (same results, no
        amortization) so hosts without a compiler keep working."""
        lib = _load()
        x = np.ascontiguousarray(x, np.float32)
        batch = x.shape[0]
        if lib.mio_runtime_abi_version() < 4:
            return np.stack([self(x[b], n_threads=n_threads)
                             for b in range(batch)])
        y = np.empty((batch, self.n), np.float32)
        q = np.empty(batch * self.k, np.int8)
        s = np.empty(batch * (self.k // 32), np.float32)
        lib.mio_q8_gemm_f32(self.raw.ctypes.data, x.ctypes.data,
                            self.n, self.k, batch, y.ctypes.data,
                            q.ctypes.data, s.ctypes.data, n_threads)
        return y


def q8_quantize_weights(w: np.ndarray) -> np.ndarray:
    """f32 [N, K] -> raw Q8_0 block bytes (synthetic/converted models; real
    MioTTS GGUFs carry Q8_0 payloads already)."""
    n, k = w.shape
    assert k % 32 == 0
    blocks = w.reshape(n, k // 32, 32).astype(np.float32)
    amax = np.abs(blocks).max(axis=2)
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.rint(blocks * inv[:, :, None]).astype(np.int8)
    out = np.empty((n, k // 32, 34), np.uint8)
    out[:, :, :2] = d.astype(np.float16).view(np.uint8).reshape(n, k // 32, 2)
    out[:, :, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def q8_row_dequant(raw: np.ndarray, row: int, k: int) -> np.ndarray:
    lib = _load()
    out = np.empty(k, np.float32)
    lib.mio_q8_row_dequant(raw.ctypes.data, row, k, out.ctypes.data)
    return out


# ---------------------------------------------------------------------------
# int4 (Q4_0) CPU decode — W4A8, half the weight traffic of Q8_0. The gemv
# is memory-bandwidth-bound, so this is ~2x tokens/s on low-bandwidth hosts
# (the llama.cpp Q4_0 story; block layout matches gguf.quants._dequant_q4_0).
# ---------------------------------------------------------------------------

def q4_available() -> bool:
    lib = _load()
    return lib is not None and lib.mio_runtime_abi_version() >= 3


class Q4Gemv:
    """One Q4_0 weight matrix [N, K] (raw GGUF block bytes: per-32 f16
    scale + 16 nibble bytes); y = W @ x per call. Per-call scratch for
    thread safety, same as Q8Gemv."""

    def __init__(self, raw: np.ndarray, n: int, k: int):
        assert k % 32 == 0, k
        self.raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
        assert self.raw.size == n * (k // 32) * 18, (self.raw.size, n, k)
        self.n = n
        self.k = k

    def __call__(self, x: np.ndarray, out: np.ndarray | None = None,
                 n_threads: int = 1) -> np.ndarray:
        lib = _load()
        x = np.ascontiguousarray(x, np.float32)
        y = out if out is not None else np.empty(self.n, np.float32)
        q = np.empty(self.k, np.int8)
        s = np.empty(self.k // 32, np.float32)
        lib.mio_q4_gemv_f32(self.raw.ctypes.data, x.ctypes.data,
                            self.n, self.k, y.ctypes.data,
                            q.ctypes.data, s.ctypes.data, n_threads)
        return y

    def gemm(self, x: np.ndarray, n_threads: int = 1) -> np.ndarray:
        """[B, K] @ W^T -> [B, N] (see Q8Gemv.gemm, incl. abi<4 fallback)."""
        lib = _load()
        x = np.ascontiguousarray(x, np.float32)
        batch = x.shape[0]
        if lib.mio_runtime_abi_version() < 4:
            return np.stack([self(x[b], n_threads=n_threads)
                             for b in range(batch)])
        y = np.empty((batch, self.n), np.float32)
        q = np.empty(batch * self.k, np.int8)
        s = np.empty(batch * (self.k // 32), np.float32)
        lib.mio_q4_gemm_f32(self.raw.ctypes.data, x.ctypes.data,
                            self.n, self.k, batch, y.ctypes.data,
                            q.ctypes.data, s.ctypes.data, n_threads)
        return y


def q4_quantize_weights(w: np.ndarray) -> np.ndarray:
    """f32 [N, K] -> raw Q4_0 block bytes (llama.cpp quantize_row_q4_0
    arithmetic: scale from the max-|x| element SIGNED value / -8, nibbles
    biased +8)."""
    n, k = w.shape
    assert k % 32 == 0
    blocks = w.reshape(n, k // 32, 32).astype(np.float32)
    # value (signed) at the position of max |x| per block
    idx = np.abs(blocks).argmax(axis=2)
    vmax = np.take_along_axis(blocks, idx[:, :, None], axis=2)[:, :, 0]
    d = (vmax / -8.0).astype(np.float32)
    # store/read the scale as f16 exactly as the kernel will see it
    d16 = d.astype(np.float16)
    df = d16.astype(np.float32)
    inv = np.where(df != 0, 1.0 / np.where(df == 0, 1, df), 0.0)
    q = np.clip(np.floor(blocks * inv[:, :, None] + 8.5), 0, 15).astype(
        np.uint8)
    out = np.empty((n, k // 32, 18), np.uint8)
    out[:, :, :2] = d16.view(np.uint8).reshape(n, k // 32, 2)
    out[:, :, 2:] = q[:, :, :16] | (q[:, :, 16:] << 4)
    return out.reshape(-1)


def q4_row_dequant(raw: np.ndarray, row: int, k: int) -> np.ndarray:
    lib = _load()
    out = np.empty(k, np.float32)
    lib.mio_q4_row_dequant(raw.ctypes.data, row, k, out.ctypes.data)
    return out
