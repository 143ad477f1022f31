"""MioTTS pipeline context: model loading + jitted, length-bucketed synthesis.

TPU-native equivalent of ``mio_tts_context`` (mio-tts-lib.cpp:33-43,795-860):
instead of a runtime mutex around per-shape GGML graph rebuilds, requests are
padded into a small ladder of length buckets and dispatched to a jitted
forward whose compiled executables are cached by XLA per bucket. Contexts are
trivially shareable across threads (weights are immutable jax arrays), so the
reference's ``mio_tts_context_clone`` becomes a no-op.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import MIO_CODE_MAX, MIO_CODE_MIN
from .gguf.writer import load_embedding_gguf, save_embedding_gguf
from .models.miocodec import (
    MioCodecConfig,
    codec_synthesize,
    encode_global_embedding,
    load_miocodec,
)

DEFAULT_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)


@jax.jit
def _pack_audio(audio_row, n_samples):
    """[T+1] f32: audio followed by the valid-sample count (single fetch)."""
    return jnp.concatenate([audio_row.astype(jnp.float32),
                            n_samples.astype(jnp.float32)[None]])


@functools.partial(jax.jit, static_argnums=2)
def _window_slice(audio, starts, window):
    """[B, window]: per-lane slice audio[b, starts[b]:starts[b]+window] with
    zeros beyond each row. Shared by the B=1 pipeline packer below and the
    batched serving packer (serving/codec_batching.pack_window) so the wire
    window layout and masking rule cannot drift apart."""
    T = audio.shape[1]
    idx = (starts[:, None].astype(jnp.int32)
           + jnp.arange(window, dtype=jnp.int32)[None, :])
    win = jnp.take_along_axis(audio, jnp.clip(idx, 0, T - 1), axis=1)
    return jnp.where(idx < T, win, 0.0)


def _pack_audio_window(audio, n_samples, window, starts):
    """[B*window + B] f32: per-lane window slices followed by the
    valid-sample counts.

    Streaming prefix re-decodes only need the newly stabilized samples —
    fetching the full padded decode moved ~50x more bytes than the emission
    across a 12-36 MB/s device link (the dominant streaming cost)."""
    win = _window_slice(audio, starts, window).astype(jnp.float32)
    return jnp.concatenate([win.reshape(-1),
                            n_samples.astype(jnp.float32).reshape(-1)])


def _reference_embedding_fused(codec_cfg, wavlm_cfg, codec_w, wavlm_w,
                               wav, n):
    """wav16k [1, bucket] -> packed [emb(adanorm_dim) | ssl_ok | pre_ok].

    The whole reference chain on device: WavLM forward, the finite-fallback
    choice between ssl and ssl_pre (checked over VALID frames only, like
    the host ladder did), and the ConvNeXt global encoder — one dispatch,
    one sub-KB fetch."""
    from .models.miocodec import encode_global_embedding
    from .models.wavlm import wavlm_forward

    ssl, ssl_pre, fl = wavlm_forward(wavlm_cfg, wavlm_w, wav, n)
    valid = (jnp.arange(ssl.shape[1])[None, :, None] < fl[:, None, None])
    ssl_ok = jnp.all(jnp.isfinite(ssl) | ~valid)
    pre_ok = jnp.all(jnp.isfinite(ssl_pre) | ~valid)
    feats = jnp.where(ssl_ok, ssl, jnp.where(pre_ok, ssl_pre,
                                             jnp.zeros_like(ssl)))
    feats = jnp.where(valid, feats, 0.0)  # padded frames stay exactly 0
    emb = encode_global_embedding(codec_cfg, codec_w, feats, fl)
    return jnp.concatenate([
        emb[0].astype(jnp.float32),
        jnp.asarray([ssl_ok, pre_ok], jnp.float32)])


def pick_bucket(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


@dataclasses.dataclass
class SynthesisResult:
    # f32 mono, or int16 PCM when fetched via CodecMicroBatcher(pcm16=True)
    # (device-side quantization identical to audio_io.encode_pcm16)
    audio: np.ndarray
    sample_rate: int
    decode_ms: float
    n_codes: int
    n_frames: int
    # window-fetch mode (streaming): audio is the slice
    # [window_start, window_start + len(audio)) of the full decode, and
    # n_total is the decode's total valid sample count
    window_start: int = 0
    n_total: int | None = None


class MioTTSPipeline:
    """Shared-weights synthesis context.

    Thread-safe without locks: all state after construction is immutable.
    """

    def __init__(
        self,
        codec_path: str | Path,
        wavlm_path: str | Path | None = None,
        buckets: tuple[int, ...] = DEFAULT_BUCKETS,
        sp_devices: list | None = None,
    ):
        from .runtime.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.codec_path = str(codec_path)
        self.config, weights = load_miocodec(self.codec_path)
        self.buckets = buckets
        # sequence parallelism (--sequence-parallel): shard each decode's
        # TIME axis over an "sp" mesh so every chip works on one utterance —
        # the single-request latency lever on multi-chip hosts, where dp
        # fan-out leaves all but one device idle at B=1. GSPMD inserts the
        # conv halo exchanges / GroupNorm-stat reductions / resize gathers
        # from the constraints in codec_decode_spec alone.
        self.sp_mesh = None
        self._sp_data = None
        self._sp_repl = None
        if sp_devices is not None and len(sp_devices) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import make_sp_mesh

            self.sp_mesh = make_sp_mesh(sp_devices)
            self._sp_data = NamedSharding(self.sp_mesh, P(None, "sp"))
            self._sp_repl = NamedSharding(self.sp_mesh, P())
        # one packed host->device transfer (bit-identical to per-leaf
        # asarray; measured 3.6x relay upload bandwidth — device_dequant.py);
        # under sp the leaves land mesh-replicated directly, no re-transfer
        from .runtime.device_dequant import device_put_packed

        self.weights = device_put_packed(weights, sharding=self._sp_repl)
        self._synth_fn = jax.jit(
            functools.partial(codec_synthesize, self.config,
                              sp_mesh=self.sp_mesh),
            static_argnames=("interp_anchor_tokens", "peak_normalize"),
        )
        self._encode_fn = jax.jit(functools.partial(encode_global_embedding, self.config))
        self.wavlm = None
        if wavlm_path:
            from .models.wavlm import WavLMExtractor

            self.wavlm = WavLMExtractor(str(wavlm_path),
                                        sharding=self._sp_repl)
            self._ref_fused_fn = jax.jit(functools.partial(
                _reference_embedding_fused, self.config, self.wavlm.config))

    # -- introspection (mio-tts-lib.h parity) --------------------------------

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def samples_per_token(self) -> int:
        return self.config.samples_per_token

    @property
    def is_dynamic_global(self) -> bool:
        return self.config.dynamic_global

    @property
    def has_global_encoder(self) -> bool:
        return "global_encoder" in self.weights

    def clone(self) -> "MioTTSPipeline":
        """Weights are immutable + jit cache is shared: a clone is self
        (reference needed shared_ptr plumbing, mio-tts-lib.cpp:847-859)."""
        return self

    # -- synthesis -------------------------------------------------------------

    def validate_request(
        self,
        codes: list[int] | np.ndarray,
        embedding: np.ndarray | None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """Shared request validation (mio_tts_synthesize preconditions,
        mio-tts-lib.cpp:1198-1234). Returns normalized (codes, embedding)."""
        codes = np.asarray(codes, dtype=np.int32).reshape(-1)
        if codes.size == 0:
            raise ValueError("codes are empty")
        if codes.min() < MIO_CODE_MIN or codes.max() > MIO_CODE_MAX:
            if codes.max() >= self.config.vocab_size or codes.min() < 0:
                raise ValueError("code id out of range")
        if self.config.dynamic_global and embedding is None:
            raise ValueError("dynamic-global MioCodec requires embedding")
        if not self.config.dynamic_global and embedding is not None:
            raise ValueError("static MioCodec does not accept external embedding")
        if embedding is not None:
            embedding = np.asarray(embedding, dtype=np.float32).reshape(-1)
            if embedding.size != self.config.decoder_adanorm_dim:
                raise ValueError("embedding dimension mismatch")
        return codes, embedding

    def synthesize(
        self,
        codes: list[int] | np.ndarray,
        embedding: np.ndarray | None = None,
        interp_anchor: int | None = None,
        peak_normalize: bool = True,
        window: tuple[int, int] | None = None,
    ) -> SynthesisResult:
        """codes -> waveform (mio_tts_synthesize, mio-tts-lib.cpp:1182-1323).

        ``window=(start, length)`` fetches only audio[start:start+length]
        (``length`` is static per executable; ``start`` is dynamic) — the
        streaming synthesizer's per-feed emission is a tiny slice of the
        prefix decode, so fetching the rest only burns device-link bytes."""
        codes, embedding = self.validate_request(codes, embedding)

        n = int(codes.size)
        bucket = pick_bucket(n, self.buckets)
        if self.sp_mesh is not None:
            sp = self.sp_mesh.shape["sp"]
            bucket = -(-bucket // sp) * sp  # even T shards
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :n] = codes
        if self.sp_mesh is not None:
            # place the host arrays straight onto the mesh — an intermediate
            # jnp.asarray commits to the default device and pays a second
            # transfer per call (~10 ms relay floor per hop, CLAUDE.md)
            tokens = jax.device_put(tokens, self._sp_data)
            lengths = jax.device_put(np.asarray([n], np.int32), self._sp_repl)
            cond = (jax.device_put(embedding[None], self._sp_repl)
                    if embedding is not None else None)
        else:
            tokens = jnp.asarray(tokens)
            lengths = jnp.asarray([n], jnp.int32)
            cond = (jnp.asarray(embedding)[None]
                    if embedding is not None else None)

        from .runtime.tracing import maybe_start_profiler, trace_phase

        maybe_start_profiler()
        t0 = time.perf_counter()
        with trace_phase("miocodec_synthesize"):
            audio, n_samples = self._synth_fn(self.weights, tokens, lengths, cond,
                                              interp_anchor_tokens=interp_anchor,
                                              peak_normalize=peak_normalize)
        # one packed device->host transfer (audio + sample count) — separate
        # fetches pay two full round trips through the device link
        if window is not None:
            start, length = window
            packed = np.asarray(_pack_audio_window(
                audio, n_samples, int(length),
                jnp.asarray([start], jnp.int32)))
            win = packed[:-1]
            n_valid = int(packed[-1])
            decode_ms = (time.perf_counter() - t0) * 1e3
            return SynthesisResult(
                audio=win[: max(0, min(int(length), n_valid - int(start)))],
                sample_rate=self.config.sample_rate,
                decode_ms=decode_ms,
                n_codes=n,
                n_frames=n_valid // self.config.hop_length,
                window_start=int(start),
                n_total=n_valid,
            )
        packed = np.asarray(_pack_audio(audio[0], n_samples[0]))
        audio = packed[:-1]
        n_valid = int(packed[-1])
        decode_ms = (time.perf_counter() - t0) * 1e3
        return SynthesisResult(
            audio=audio[:n_valid],
            sample_rate=self.config.sample_rate,
            decode_ms=decode_ms,
            n_codes=n,
            n_frames=n_valid // self.config.hop_length,
        )

    # -- voice cloning ----------------------------------------------------------

    def reference_to_embedding(
        self,
        reference_audio: str | Path,
        max_reference_seconds: float = 20.0,
    ) -> np.ndarray:
        """Reference audio -> 128-d speaker embedding
        (mio_tts_reference_to_embedding, mio-tts-lib.cpp:1048-1125)."""
        if not self.is_dynamic_global:
            raise ValueError("reference embedding requires dynamic-global MioCodec")
        if not self.has_global_encoder:
            raise ValueError("reference embedding requires global_encoder tensors in MioCodec GGUF")
        if self.wavlm is None:
            raise ValueError("WavLM model is not loaded")
        # ONE device round trip: wavlm forward + the finite-fallback choice
        # (ssl -> ssl_pre ladder, wavlm.py:305-333) + the global encoder run
        # fused in-graph, fetching only [emb | flags] (~0.5 KB). The
        # round-2 path fetched the [T, 768] SSL features to host for the
        # finite check and re-uploaded them (~3 MB through a 12-36 MB/s
        # relay — most of the measured 270 ms refgen latency).
        wav16k = self.wavlm.preprocess_reference(
            reference_audio, source_rate=self.config.sample_rate,
            max_seconds=max_reference_seconds)
        n = int(wav16k.size)
        bucket = self.wavlm.pick_wav_bucket(n)
        padded = np.zeros((1, bucket), np.float32)
        padded[0, :n] = wav16k
        packed = np.asarray(self._ref_fused_fn(
            self.weights, self.wavlm.weights, jnp.asarray(padded),
            jnp.asarray([n], jnp.int32)))
        d = self.config.decoder_adanorm_dim
        emb, ssl_ok, pre_ok = packed[:d], packed[d] > 0, packed[d + 1] > 0
        if not ssl_ok and not pre_ok:
            # both SSL feature sets non-finite: audio-stat fallback (host,
            # rare — mirrors the reference's last-resort ladder rung)
            from .models.wavlm import _audio_stat_fallback

            fb = _audio_stat_fallback(wav16k, self.wavlm.config.embed_dim)
            emb = np.asarray(self._encode_fn(
                self.weights, jnp.asarray(fb)[None],
                jnp.asarray([fb.shape[0]], jnp.int32))[0])
        return np.asarray(emb, dtype=np.float32)

    # -- workspace estimates (mio_tts_estimate_workspace_bytes parity) -------------

    def estimate_workspace_bytes(self, n_codes: int) -> int:
        """Rough device-memory footprint of one synthesis at this length
        (mio-tts-lib.cpp:1347-1367 parity; informational — XLA plans buffers)."""
        cfg = self.config
        n = pick_bucket(max(1, n_codes), self.buckets)
        frames = cfg.stft_frames(n)
        acts = 4 * frames * (cfg.decoder_dim * 24 + cfg.decoder_ff * 3)
        acts += 4 * n * (cfg.prenet_dim * 20 + cfg.prenet_ff * 3)
        acts += 4 * frames * (cfg.n_fft + 2) * 3  # spec + iSTFT frames
        return int(acts)

    def estimate_reference_workspace_bytes(self, max_reference_seconds: float = 20.0) -> int:
        if self.wavlm is None:
            raise ValueError("WavLM model is not loaded")
        frames = self.wavlm.estimate_ssl_frames(self.config.sample_rate,
                                                max_reference_seconds)
        e = self.wavlm.config.embed_dim
        h = self.wavlm.config.n_heads
        return int(4 * frames * e * 20 + 4 * frames * frames * h * 2)

    # -- embedding I/O ------------------------------------------------------------

    @staticmethod
    def load_embedding(path: str | Path) -> np.ndarray:
        return load_embedding_gguf(path)

    @staticmethod
    def save_embedding(path: str | Path, embedding: np.ndarray) -> None:
        save_embedding_gguf(path, embedding)
