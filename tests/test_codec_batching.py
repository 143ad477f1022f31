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


def test_priority_group_runs_first(setup):
    """A gather batch holding a priority item (a fresh stream's first feed)
    must run that item's group before same-gather groups without one, while
    steady groups keep arrival order (stable sort)."""
    pipe, batcher, cfg = setup
    # item layout: (codes, emb, opts, fut, wstart, priority)
    steady_a = ([1], None, ("a",), None, 0, False)
    steady_b = ([1], None, ("b",), None, 0, False)
    prio_c = ([1], None, ("c",), None, 0, True)
    ordered = CodecMicroBatcher._ordered_groups([steady_a, steady_b, prio_c])
    assert [opts for opts, _ in ordered] == [("c",), ("a",), ("b",)]
    # a priority item whose opts MATCH a steady group promotes that group
    # (they share one device call) without reordering within the group
    steady_c2 = ([2], None, ("c",), None, 0, False)
    ordered = CodecMicroBatcher._ordered_groups(
        [steady_a, steady_c2, prio_c, steady_b])
    assert [opts for opts, _ in ordered] == [("c",), ("a",), ("b",)]
    assert [it[0] for it in ordered[0][1]] == [[2], [1]]


def test_priority_end_to_end_matches_solo(setup):
    """priority=True must not change results — only scheduling order."""
    pipe, batcher, cfg = setup
    rng = np.random.RandomState(3)
    codes = rng.randint(0, cfg.vocab_size, 12).tolist()
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    a = batcher.synthesize(codes, emb, priority=True)
    b = pipe.synthesize(codes, emb)
    np.testing.assert_allclose(a.audio, b.audio, rtol=1e-4, atol=1e-5)


def test_streaming_first_feed_passes_priority(setup):
    """StreamingSynthesizer must flag exactly the first window decode as
    priority when the synth_fn supports the kwarg."""
    from miotts_tpu.streaming import StreamingSynthesizer

    pipe, batcher, cfg = setup
    rng = np.random.RandomState(4)
    emb = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    seen = []

    def spy_synth(codes, embedding, priority=False, **kw):
        seen.append(bool(priority))
        return batcher.synthesize(codes, embedding, priority=priority, **kw)

    ss = StreamingSynthesizer(pipe, emb, synth_fn=spy_synth,
                              lookahead_tokens=2, min_decode_tokens=2)
    rng2 = np.random.RandomState(5)
    for _ in range(4):
        ss.feed(rng2.randint(0, cfg.vocab_size, 4).tolist())
    ss.finalize()
    decodes_with_priority = [p for p in seen]
    assert decodes_with_priority[0] is True  # the first feed
    assert not any(decodes_with_priority[1:])  # never again
