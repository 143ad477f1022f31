"""Streaming synthesis tests: chunked emission covers the full signal and
closely matches the one-shot decode."""

import numpy as np
import pytest

from miotts_tpu.pipeline import MioTTSPipeline
from miotts_tpu.streaming import StreamingSynthesizer
from miotts_tpu.testing import tiny_codec_config, write_synthetic_miocodec_gguf
from miotts_tpu.gguf.writer import save_embedding_gguf


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    cfg = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(d / "codec.gguf"), cfg, seed=0)
    return MioTTSPipeline(str(d / "codec.gguf")), cfg


def test_streaming_matches_oneshot(pipe):
    """Streaming is an approximation by architecture (GroupNorm stats and
    the bilinear resample couple every frame to the full length); with the
    interp anchor pinned, the residual drift comes only from GN-stat and
    local-attention boundary effects and must stay small."""
    pipeline, cfg = pipe
    rng = np.random.RandomState(0)
    codes = rng.randint(0, cfg.vocab_size, 60).tolist()
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)

    full = pipeline.synthesize(codes, emb,
                               interp_anchor=StreamingSynthesizer.INTERP_ANCHOR,
                               peak_normalize=False).audio

    ss = StreamingSynthesizer(pipeline, emb, lookahead_tokens=8)
    pieces = []
    for i in range(0, len(codes), 7):
        pcm = ss.feed(codes[i:i + 7])
        if pcm.size:
            pieces.append(pcm)
    pieces.append(ss.finalize())
    streamed = np.concatenate(pieces)

    assert streamed.size == full.size
    err = np.abs(streamed - full)
    scale = max(1e-6, float(np.abs(full).max()))
    assert np.median(err) / scale < 0.05
    # the final emission comes from the exact full decode: the last
    # lookahead-sized region minus the crossfade ramp must match exactly
    tail = 8 * cfg.samples_per_token - 128  # lookahead minus crossfade
    assert tail > 0
    np.testing.assert_allclose(streamed[-tail:], full[-tail:], rtol=1e-4, atol=1e-5)


def test_streaming_incremental_latency(pipe):
    """First audio must be available after lookahead+chunk tokens, not at
    the end."""
    pipeline, cfg = pipe
    rng = np.random.RandomState(1)
    codes = rng.randint(0, cfg.vocab_size, 40).tolist()
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    ss = StreamingSynthesizer(pipeline, emb, lookahead_tokens=4)
    first = ss.feed(codes[:12])
    assert first.size == (12 - 4) * cfg.samples_per_token
    second = ss.feed(codes[12:24])
    assert second.size == 12 * cfg.samples_per_token
    rest = ss.feed(codes[24:])
    tail = ss.finalize()
    total = first.size + second.size + rest.size + tail.size
    assert total == len(codes) * cfg.samples_per_token


def test_window_fetch_matches_full_fetch(pipe):
    """The per-feed window fetch (default) must emit bit-identical PCM to
    the full-decode fetch (forced via window_samples=1, which makes every
    feed take the fallback path) — the window is purely a transfer-size
    optimization."""
    pipeline, cfg = pipe
    rng = np.random.RandomState(3)
    codes = rng.randint(0, cfg.vocab_size, 60).tolist()
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)

    def run(window_samples):
        ss = StreamingSynthesizer(pipeline, emb, lookahead_tokens=8,
                                  window_samples=window_samples)
        pieces = []
        for i in range(0, len(codes), 7):
            pcm = ss.feed(codes[i:i + 7])
            if pcm.size:
                pieces.append(pcm)
        pieces.append(ss.finalize())
        return np.concatenate(pieces)

    # 512 < bucket*spt for every prefix here, so real window fetches run
    # (the tiny config's buckets are smaller than the production default
    # window, which would route everything through the full-fetch path)
    windowed = run(512)
    full = run(1)                 # every feed falls back to a full fetch
    assert windowed.size == full.size
    np.testing.assert_array_equal(windowed, full)


def test_streaming_monotone_no_rewrites(pipe):
    pipeline, cfg = pipe
    rng = np.random.RandomState(2)
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    ss = StreamingSynthesizer(pipeline, emb)
    emitted = 0
    for i in range(6):
        pcm = ss.feed(rng.randint(0, cfg.vocab_size, 9).tolist())
        emitted += pcm.size
        assert ss.emitted == emitted
    tail = ss.finalize()
    assert ss.emitted == emitted + tail.size == 54 * cfg.samples_per_token
