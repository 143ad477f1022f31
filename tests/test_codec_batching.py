"""Codec micro-batcher: batched results must equal solo pipeline results."""

import concurrent.futures

import numpy as np
import pytest

from miotts_tpu.pipeline import MioTTSPipeline
from miotts_tpu.serving.codec_batching import CodecMicroBatcher
from miotts_tpu.testing import tiny_codec_config, write_synthetic_miocodec_gguf


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("cb")
    cfg = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(d / "codec.gguf"), cfg, seed=0)
    pipe = MioTTSPipeline(str(d / "codec.gguf"))
    batcher = CodecMicroBatcher(pipe, max_batch=4, gather_window_s=0.02)
    yield pipe, batcher, cfg
    batcher.shutdown()


def test_single_matches_pipeline(setup):
    pipe, batcher, cfg = setup
    rng = np.random.RandomState(0)
    codes = rng.randint(0, cfg.vocab_size, 20).tolist()
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    a = batcher.synthesize(codes, emb)
    b = pipe.synthesize(codes, emb)
    assert a.audio.size == b.audio.size
    np.testing.assert_allclose(a.audio, b.audio, rtol=1e-4, atol=1e-5)


def test_concurrent_mixed_lengths_match_solo(setup):
    pipe, batcher, cfg = setup
    rng = np.random.RandomState(1)
    reqs = [(rng.randint(0, cfg.vocab_size, 5 + 7 * i).tolist(),
             rng.randn(cfg.decoder_adanorm_dim).astype(np.float32))
            for i in range(4)]
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(lambda r: batcher.synthesize(*r), reqs))
    for (codes, emb), res in zip(reqs, results):
        solo = pipe.synthesize(codes, emb)
        assert res.audio.size == solo.audio.size == len(codes) * cfg.samples_per_token
        np.testing.assert_allclose(res.audio, solo.audio, rtol=1e-4, atol=1e-5)


def test_pcm16_fetch_matches_host_quantization(setup):
    """pcm16=True must return int16 PCM bit-identical to quantizing the f32
    fetch on the host (same bytes a served WAV16 carries), with the valid
    length intact."""
    from miotts_tpu.runtime.audio_io import encode_pcm16

    pipe, batcher, cfg = setup
    rng = np.random.RandomState(2)
    codes = rng.randint(0, cfg.vocab_size, 20).tolist()
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    q = batcher.synthesize(codes, emb, pcm16=True)
    f = batcher.synthesize(codes, emb)
    assert q.audio.dtype == np.int16
    assert q.audio.size == f.audio.size
    assert encode_pcm16(q.audio) == encode_pcm16(f.audio)


def test_validation_errors_propagate(setup):
    pipe, batcher, cfg = setup
    with pytest.raises(ValueError, match="codes are empty"):
        batcher.synthesize([], np.zeros(cfg.decoder_adanorm_dim, np.float32))
    with pytest.raises(ValueError, match="requires embedding"):
        batcher.synthesize([1, 2, 3], None)
    with pytest.raises(ValueError, match="dimension mismatch"):
        batcher.synthesize([1, 2, 3], np.zeros(7, np.float32))
