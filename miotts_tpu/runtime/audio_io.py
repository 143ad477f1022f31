"""WAV read/write + resampling.

- ``save_wav16`` matches the reference's writer bit-for-bit: 44-byte RIFF
  header (mio-tts-lib.cpp:49-63), clamp to [-1, 1], round-to-nearest-even
  scale by 32767 (:779-782), mono 16-bit PCM.
- ``load_audio`` replaces miniaudio (wavlm-extractor.cpp:153-203): decodes
  WAV PCM 8/16/24/32 and float32/64, mixes to mono by channel average, and
  linearly resamples to the requested rate.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

WAV_HEADER_BYTES = 44


def wav16_header(n_samples: int, sample_rate: int, num_channels: int = 1) -> bytes:
    bits = 16
    byte_rate = sample_rate * num_channels * (bits // 8)
    block_align = num_channels * (bits // 8)
    data_size = n_samples * (bits // 8)
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_size, b"WAVE",
        b"fmt ", 16, 1, num_channels, sample_rate, byte_rate, block_align, bits,
        b"data", data_size,
    )


def wav16_streaming_header(sample_rate: int, num_channels: int = 1) -> bytes:
    """WAV header for incremental delivery of a stream whose final length is
    unknown when the response starts: RIFF/data sizes carry the 0xFFFFFFFF
    streaming convention. The reference always synthesizes fully before
    sending (tts-mio-server.cpp:3876-3886); chunked streaming delivery is a
    TPU-framework addition (BASELINE config 4)."""
    bits = 16
    byte_rate = sample_rate * num_channels * (bits // 8)
    block_align = num_channels * (bits // 8)
    return struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 0xFFFFFFFF, b"WAVE",
        b"fmt ", 16, 1, num_channels, sample_rate, byte_rate, block_align, bits,
        b"data", 0xFFFFFFFF,
    )


def encode_pcm16(audio: np.ndarray) -> bytes:
    """f32 [-1,1] -> little-endian 16-bit PCM bytes (same clamp/round as
    encode_wav16, without the header — for streaming chunks). int16 input
    (already quantized on device, see CodecMicroBatcher pcm16 fetch) passes
    through untouched."""
    audio = np.asarray(audio)
    if audio.dtype == np.int16:
        return audio.astype("<i2", copy=False).tobytes()
    x = np.clip(audio.astype(np.float32), -1.0, 1.0)
    return np.rint(x * 32767.0).astype("<i2").tobytes()


def encode_wav16(audio: np.ndarray, sample_rate: int) -> bytes:
    audio = np.asarray(audio)
    if audio.dtype == np.int16:  # device-quantized PCM: header + bytes
        pcm = audio.astype("<i2", copy=False)
        return wav16_header(pcm.size, sample_rate) + pcm.tobytes()
    from .native import encode_wav16_native

    native = encode_wav16_native(audio.astype(np.float32), sample_rate)
    if native is not None:
        return native
    x = np.clip(audio.astype(np.float32), -1.0, 1.0)
    pcm = np.rint(x * 32767.0).astype(np.int16)
    return wav16_header(pcm.size, sample_rate) + pcm.tobytes()


def save_wav16(path: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    Path(path).write_bytes(encode_wav16(audio, sample_rate))


def _parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        csize = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + csize]
        if cid == b"fmt ":
            (audio_format, channels, rate, _br, _ba, bits) = struct.unpack_from("<HHIIHH", body, 0)
            if audio_format == 0xFFFE and csize >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_format = struct.unpack_from("<H", body, 24)[0]
            fmt = (audio_format, channels, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, bits = fmt
    if audio_format == 1:  # PCM
        if bits == 8:
            x = (np.frombuffer(samples, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(samples, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(samples, np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            vals = (raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16))
            vals = np.where(vals >= (1 << 23), vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(samples, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(samples, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format tag {audio_format}")
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), rate


def resample_linear(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear resampler matching the reference's WavLM input path
    (wavlm-extractor.cpp:218-240): position mapping src_pos = i * src/dst,
    clamped gather of the two neighbors."""
    if src_rate == dst_rate or x.size == 0:
        return x
    n_dst = int(round(x.size * (dst_rate / src_rate)))
    if n_dst <= 0:
        return np.zeros(0, np.float32)
    pos = np.arange(n_dst, dtype=np.float64) * (src_rate / dst_rate)
    i0 = np.floor(pos).astype(np.int64)
    frac = (pos - i0).astype(np.float32)
    i0 = np.clip(i0, 0, x.size - 1)
    i1 = np.clip(i0 + 1, 0, x.size - 1)
    return (x[i0] * (1.0 - frac) + x[i1] * frac).astype(np.float32)


def load_audio(path: str | Path, target_rate: int | None = None,
               max_seconds: float | None = None) -> tuple[np.ndarray, int]:
    """Decode an audio file to f32 mono, optionally resample and truncate.

    WAV is parsed natively; other containers fall back to torchaudio when
    available (the image bundles torch-cpu)."""
    data = Path(path).read_bytes()
    if data[:4] == b"RIFF":
        x, rate = _parse_wav(data)
    else:
        try:
            import torchaudio  # type: ignore
        except ImportError:
            raise ValueError(
                f"unsupported audio format in {path}: only WAV is decoded "
                "natively (install torchaudio for other containers)") from None
        try:
            wav, rate = torchaudio.load(str(path))
            x = wav.mean(dim=0).numpy().astype(np.float32)
        except Exception as e:  # pragma: no cover - depends on image contents
            raise ValueError(f"cannot decode audio file {path}: {e}") from e
    if target_rate is not None and rate != target_rate:
        x = resample_linear(x, rate, target_rate)
        rate = target_rate
    if max_seconds is not None and max_seconds > 0:
        x = x[: int(max_seconds * rate)]
    return x, rate
