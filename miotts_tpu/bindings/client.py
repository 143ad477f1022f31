"""ctypes wrapper over the native mio_tpu_client bridge library.

The C library (bindings/native/mio_tpu_client.{h,cpp}) is what a device app
links against — the TPU-era counterpart of the reference's on-device bridges
(MioTTSLocalBridge.h:11-92, mio_tts_android_jni.cpp:73-425). This wrapper
exists so the bridge is testable from pytest and usable from Python tools;
it exercises the exact same C ABI an iOS/Android app would.

Build: ``python -m miotts_tpu.bindings.build_client`` (auto-built on first
use when g++/clang++ is available).
"""

from __future__ import annotations

import ctypes
import shutil
import subprocess
import sys
import threading
from pathlib import Path

_SRC = Path(__file__).parent / "native" / "mio_tpu_client.cpp"
_OUT = Path(__file__).parent / "native" / "libmio_tpu_client.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def build_client_lib(verbose: bool = False) -> Path | None:
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        if verbose:
            print("no C++ compiler found", file=sys.stderr)
        return None
    cmd = [cxx, "-O2", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-o", str(_OUT)]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError as e:
        if verbose:
            print(f"client bridge build failed: {e}", file=sys.stderr)
        return None
    return _OUT


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _OUT.exists() or _OUT.stat().st_mtime < _SRC.stat().st_mtime:
            if build_client_lib() is None:
                raise RuntimeError("cannot build libmio_tpu_client.so "
                                   "(no C++ compiler?)")
        lib = ctypes.CDLL(str(_OUT))
        lib.mio_tpu_client_create.restype = ctypes.c_void_p
        lib.mio_tpu_client_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_client_destroy.argtypes = [ctypes.c_void_p]
        lib.mio_tpu_client_set_generation_params.restype = ctypes.c_bool
        lib.mio_tpu_client_set_generation_params.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_size_t]
        for name in ("mio_tpu_client_health_json",
                     "mio_tpu_client_list_references_json"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_bool
            fn.argtypes = [ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_char_p),
                           ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_client_create_reference_from_audio.restype = ctypes.c_bool
        lib.mio_tpu_client_create_reference_from_audio.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_float,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_client_add_reference_from_gguf.restype = ctypes.c_bool
        lib.mio_tpu_client_add_reference_from_gguf.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_client_remove_reference.restype = ctypes.c_bool
        lib.mio_tpu_client_remove_reference.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_client_synthesize_to_wav.restype = ctypes.c_bool
        lib.mio_tpu_client_synthesize_to_wav.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_client_synthesize_codes_to_wav.restype = ctypes.c_bool
        lib.mio_tpu_client_synthesize_codes_to_wav.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mio_tpu_string_free.argtypes = [ctypes.c_char_p]
        _lib = lib
        return lib


_ERR_CAP = 512


class MioTPUClient:
    """Device-app client session against a miotts-tpu server."""

    def __init__(self, base_url: str):
        self._lib = _load()
        err = ctypes.create_string_buffer(_ERR_CAP)
        self._h = self._lib.mio_tpu_client_create(
            base_url.encode(), err, _ERR_CAP)
        if not self._h:
            raise ConnectionError(err.value.decode() or "client create failed")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.mio_tpu_client_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ------------------------------------------------------------

    def _call(self, fn, *args) -> None:
        err = ctypes.create_string_buffer(_ERR_CAP)
        if not fn(self._h, *args, err, _ERR_CAP):
            raise RuntimeError(err.value.decode() or "bridge call failed")

    def _json(self, fn) -> str:
        out = ctypes.c_char_p()
        err = ctypes.create_string_buffer(_ERR_CAP)
        if not fn(self._h, ctypes.byref(out), err, _ERR_CAP):
            raise RuntimeError(err.value.decode() or "bridge call failed")
        try:
            return out.value.decode()
        finally:
            self._lib.mio_tpu_string_free(out)

    # -- API --------------------------------------------------------------------

    def set_generation_params(self, n_predict: int = -1, top_k: int = -1,
                              top_p: float = -1.0, temp: float = -1.0,
                              repeat_penalty: float = -1.0,
                              seed: int = -12345678) -> None:
        self._call(self._lib.mio_tpu_client_set_generation_params,
                   n_predict, top_k, top_p, temp, repeat_penalty, seed)

    def health_json(self) -> str:
        return self._json(self._lib.mio_tpu_client_health_json)

    def list_references_json(self) -> str:
        return self._json(self._lib.mio_tpu_client_list_references_json)

    def create_reference_from_audio(self, key: str, audio_path: str,
                                    max_reference_seconds: float = 0.0,
                                    embedding_out_path: str | None = None) -> None:
        self._call(self._lib.mio_tpu_client_create_reference_from_audio,
                   key.encode(), audio_path.encode(),
                   max_reference_seconds,
                   embedding_out_path.encode() if embedding_out_path else None)

    def add_reference_from_gguf(self, key: str, embedding_path: str) -> None:
        self._call(self._lib.mio_tpu_client_add_reference_from_gguf,
                   key.encode(), embedding_path.encode())

    def remove_reference(self, key: str) -> None:
        self._call(self._lib.mio_tpu_client_remove_reference, key.encode())

    def synthesize_to_wav(self, text: str, reference_key: str,
                          output_wav_path: str, n_predict: int = -1) -> None:
        self._call(self._lib.mio_tpu_client_synthesize_to_wav,
                   text.encode(), reference_key.encode(), n_predict,
                   output_wav_path.encode())

    def synthesize_codes_to_wav(self, codes, reference_key: str,
                                output_wav_path: str) -> None:
        arr = (ctypes.c_int32 * len(codes))(*codes)
        self._call(self._lib.mio_tpu_client_synthesize_codes_to_wav,
                   arr, len(codes), reference_key.encode(),
                   output_wav_path.encode())
