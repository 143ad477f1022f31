"""Dev-time mp3 oracles: libmp3lame encoder + libmpg123 float decoder via
ctypes. Used ONLY by tests to generate fixtures and cross-check the
self-contained numpy decoder (runtime/mp3.py) against an independent
implementation; the shipped decode path never touches these libraries."""
from __future__ import annotations

import ctypes

import numpy as np

_LAME = "libmp3lame.so.0"
_MPG123 = "libmpg123.so.0"


def have_oracles() -> bool:
    import os

    if os.environ.get("MIOTTS_MP3_ORACLES", "1") == "0":
        return False
    try:
        ctypes.CDLL(_LAME)
        ctypes.CDLL(_MPG123)
        return True
    except OSError:
        return False


def lame_encode(pcm: np.ndarray, rate: int, *, nch: int = 1,
                bitrate: int = 128, mode: int | None = None,
                quality: int = 2) -> bytes:
    """Encode float PCM [-1,1] (shape [n] or [n,2]) to an mp3 stream.

    mode: 0 stereo, 1 joint stereo, 3 mono (lame MPEG_mode)."""
    lame = ctypes.CDLL(_LAME)
    lame.lame_init.restype = ctypes.c_void_p
    gf = lame.lame_init()
    if mode is None:
        mode = 3 if nch == 1 else 1
    for name, val in [("in_samplerate", rate), ("out_samplerate", rate),
                      ("num_channels", nch), ("brate", bitrate),
                      ("mode", mode), ("bWriteVbrTag", 0),
                      ("quality", quality)]:
        f = getattr(lame, f"lame_set_{name}")
        f.argtypes = [ctypes.c_void_p, ctypes.c_int]
        f(gf, val)
    if lame.lame_init_params(ctypes.c_void_p(gf)) != 0:
        raise RuntimeError("lame_init_params failed")
    x = np.clip(pcm, -1.0, 1.0)
    if x.ndim == 1:
        left = right = (x * 32767).astype(np.int16)
        n = x.size
    else:
        xi = (x * 32767).astype(np.int16)
        left, right = np.ascontiguousarray(xi[:, 0]), \
            np.ascontiguousarray(xi[:, 1])
        n = x.shape[0]
    buf = ctypes.create_string_buffer(int(1.25 * n) + 7200)
    enc = lame.lame_encode_buffer
    enc.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
                    ctypes.POINTER(ctypes.c_short), ctypes.c_int,
                    ctypes.c_char_p, ctypes.c_int]
    w = enc(gf, left.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            n, buf, len(buf))
    if w < 0:
        raise RuntimeError(f"lame_encode_buffer: {w}")
    fl = lame.lame_encode_flush
    fl.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    w2 = fl(gf, ctypes.cast(ctypes.addressof(buf) + w, ctypes.c_char_p),
            len(buf) - w)
    lame.lame_close.argtypes = [ctypes.c_void_p]
    lame.lame_close(gf)
    return buf.raw[:w + w2]


def mpg123_decode(path: str) -> tuple[np.ndarray, int, int]:
    """Decode an mp3 file -> (float32 PCM interleaved, rate, channels)."""
    m = ctypes.CDLL(_MPG123)
    m.mpg123_init()
    m.mpg123_new.restype = ctypes.c_void_p
    m.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    err = ctypes.c_int(0)
    h = m.mpg123_new(None, ctypes.byref(err))
    ENC_F32 = 0x200
    m.mpg123_format_none.argtypes = [ctypes.c_void_p]
    m.mpg123_format_none(h)
    m.mpg123_format.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.c_int, ctypes.c_int]
    for rate in (8000, 11025, 12000, 16000, 22050, 24000,
                 32000, 44100, 48000):
        for ch in (1, 2):
            m.mpg123_format(h, rate, ch, ENC_F32)
    m.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    if m.mpg123_open(h, path.encode()) != 0:
        raise RuntimeError("mpg123_open failed")
    rate = ctypes.c_long()
    ch = ctypes.c_int()
    enc = ctypes.c_int()
    m.mpg123_getformat.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_long),
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    m.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch),
                       ctypes.byref(enc))
    m.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
    out = []
    buf = ctypes.create_string_buffer(1 << 18)
    done = ctypes.c_size_t()
    while True:
        rc = m.mpg123_read(h, buf, len(buf), ctypes.byref(done))
        out.append(buf.raw[:done.value])
        if rc != 0:
            break
    m.mpg123_delete.argtypes = [ctypes.c_void_p]
    m.mpg123_delete(h)
    pcm = np.frombuffer(b"".join(out), np.float32).copy()
    return pcm, int(rate.value), int(ch.value)
