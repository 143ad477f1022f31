"""On-TPU iSTFT head: DFT-as-matmul + vectorized overlap-add.

Replaces the reference's per-frame row-column IRFFT + std::thread OLA pool
(mio-tts-lib.cpp:435-756) with one batched MXU matmul over all frames and a
shift-and-add OLA, reproducing the reference's *exact* (non-standard)
transform: the n_freq complex bins are zero-padded to n (no Hermitian
mirror), inverse-DFT'd with positive-exponent twiddles, and the real part is
scaled by 1/n_freq (mio-tts-lib.cpp:527-529,616-621):

    frame[t] = (1/n_freq) * sum_k ( re_k*cos(2*pi*k*t/n) - im_k*sin(2*pi*k*t/n) )

with mag = min(exp(logmag), 100), re = mag*cos(phase), im = mag*sin(phase)
(:675-683). Windowing is periodic Hann; OLA is normalized by the hann^2
envelope and cropped by (n_fft - hop)/2 per side (:639-756).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _dft_tables(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq, dtype=np.float64)[:, None]
    t = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    scale = 1.0 / n_freq
    return (np.cos(ang) * scale).astype(np.float32), (np.sin(ang) * scale).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hann_periodic(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def istft_overlap_add(
    frames_time: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    n_fft: int,
    hop: int,
) -> jnp.ndarray:
    """frames_time: [B, L, n_fft] real frames; returns audio
    [B, (L-1)*hop + n_fft - 2*n_pad] (valid through the same formula with
    the true frame count).

    The OLA splits each windowed frame into r = ceil(n_fft/hop) hop-chunks
    (zero-padding the frame to r*hop when hop does not divide n_fft) and
    sums r diagonally-shifted streams — no scatter, fully vectorized."""
    B, L, nf = frames_time.shape
    assert nf == n_fft
    r = -(-n_fft // hop)  # ceil
    n_pad = (n_fft - hop) // 2

    hann = jnp.asarray(_hann_periodic(n_fft))
    mask = (jnp.arange(L, dtype=jnp.int32)[None, :] < frame_lengths[:, None])
    maskf = mask.astype(jnp.float32)[:, :, None]

    windowed = frames_time.astype(jnp.float32) * hann[None, None, :] * maskf
    env_frames = (hann * hann)[None, None, :] * maskf  # [B, L, n_fft]

    H = L + r - 1  # total length in hops
    frame_pad = r * hop - n_fft

    def ola(x):  # x: [B, L, n_fft] -> [B, H*hop]
        if frame_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, frame_pad)))
        xr = x.reshape(B, L, r, hop)
        acc = jnp.zeros((B, H, hop), jnp.float32)
        for s in range(r):
            acc = acc.at[:, s:s + L, :].add(xr[:, :, s, :])
        return acc.reshape(B, H * hop)

    audio_ola = ola(windowed)
    env_ola = ola(env_frames)
    audio = jnp.where(env_ola > 1e-12, audio_ola / jnp.maximum(env_ola, 1e-12), audio_ola)

    # crop n_pad per side (mio-tts-lib.cpp:742-753)
    out_size = (L - 1) * hop + n_fft - 2 * n_pad
    return jax_dynamic_crop(audio, n_pad, out_size)


def jax_dynamic_crop(x: jnp.ndarray, start: int, size: int) -> jnp.ndarray:
    return x[:, start:start + size]


def spec_to_audio(
    spec: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    n_fft: int,
    hop: int,
    tables: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """spec: [B, L, n_fft+2] (logmag | phase); returns audio [B, L*hop].

    ``tables`` optionally supplies the (cos, sin) DFT matrices as runtime
    arrays. Baked as tracer constants they embed ~15 MB (n_fft=1920) into
    EVERY codec executable — which a warm restart then re-ships through
    the relay per bucket/variant; the loader threads them through the
    weight tree instead (one upload, shared by all executables)."""
    n_freq = n_fft // 2 + 1
    logmag = spec[..., :n_freq].astype(jnp.float32)
    phase = spec[..., n_freq:].astype(jnp.float32)
    mag = jnp.minimum(jnp.exp(logmag), 1e2)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    cos_t, sin_t = tables if tables is not None else _dft_tables(n_fft)
    cos_t = jnp.asarray(cos_t)
    sin_t = jnp.asarray(sin_t)
    frames_time = (
        jnp.einsum("blk,kt->blt", re, cos_t, preferred_element_type=jnp.float32)
        - jnp.einsum("blk,kt->blt", im, sin_t, preferred_element_type=jnp.float32)
    )
    return istft_overlap_add(frames_time, frame_lengths, n_fft, hop)
