"""MioCodec JAX forward vs independent numpy oracle + padding invariance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.miocodec import (
    MioCodecConfig, codec_decode_spec, codec_synthesize, encode_global_embedding,
    load_miocodec,
)
from miotts_tpu.ops.istft import spec_to_audio
from miotts_tpu.testing import tiny_codec_config, write_synthetic_miocodec_gguf

import oracle_miocodec as oracle


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    cfg = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(path), cfg, seed=0)
    loaded_cfg, w = load_miocodec(str(path))
    assert dataclasses.replace(loaded_cfg, norm_eps=cfg.norm_eps,
                               group_norm_eps=cfg.group_norm_eps) == cfg
    # raw tensors for the oracle
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    return loaded_cfg, jax.tree.map(jnp.asarray, w), raw


@pytest.fixture(scope="module")
def tiny_ups_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_ups.gguf"
    cfg = tiny_codec_config(
        samples_per_token=64, hop_length=16,
        wave_upsampler_factors=(2,), wave_upsampler_kernel_sizes=(4,),
    )
    write_synthetic_miocodec_gguf(str(path), cfg, seed=1)
    loaded_cfg, w = load_miocodec(str(path))
    assert loaded_cfg.wave_upsampler_factors == (2,)
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    return loaded_cfg, jax.tree.map(jnp.asarray, w), raw


def _oracle_cfg(cfg: MioCodecConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["ups_factors"] = cfg.wave_upsampler_factors
    d["ups_kernels"] = cfg.wave_upsampler_kernel_sizes
    return d


def test_spec_matches_oracle(tiny_model):
    cfg, w, raw = tiny_model
    rng = np.random.RandomState(42)
    n = 11
    codes = rng.randint(0, cfg.vocab_size, size=n).astype(np.int32)
    cond = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32) * 0.5

    ref_spec = oracle.decode_spec(_oracle_cfg(cfg), raw, codes, cond)

    tokens = jnp.asarray(codes)[None, :]
    lengths = jnp.asarray([n], jnp.int32)
    spec, flen = jax.jit(codec_decode_spec, static_argnums=0)(cfg, w, tokens, lengths, jnp.asarray(cond)[None])
    spec = np.array(spec[0, :int(flen[0])])
    assert spec.shape == ref_spec.shape
    np.testing.assert_allclose(spec, ref_spec, rtol=2e-3, atol=2e-4)


def test_audio_matches_oracle(tiny_model):
    cfg, w, raw = tiny_model
    rng = np.random.RandomState(1)
    n = 9
    codes = rng.randint(0, cfg.vocab_size, size=n).astype(np.int32)
    cond = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32) * 0.5

    ref_spec = oracle.decode_spec(_oracle_cfg(cfg), raw, codes, cond)
    ref_audio = oracle.istft(ref_spec, cfg.n_fft, cfg.hop_length)

    tokens = jnp.asarray(codes)[None, :]
    lengths = jnp.asarray([n], jnp.int32)
    audio, n_samples = jax.jit(codec_synthesize, static_argnums=0)(
        cfg, w, tokens, lengths, jnp.asarray(cond)[None])
    got = np.array(audio[0, :int(n_samples[0])])
    assert got.shape == ref_audio.shape
    # account for the reference's peak normalization
    peak = np.abs(ref_audio).max()
    if peak > 0.98:
        ref_audio = ref_audio * (0.95 / peak)
    np.testing.assert_allclose(got, ref_audio, rtol=5e-3, atol=5e-4)


def test_padding_invariance(tiny_model):
    """A request padded into a larger bucket must produce identical audio."""
    cfg, w, raw = tiny_model
    rng = np.random.RandomState(5)
    n = 7
    codes = rng.randint(0, cfg.vocab_size, size=n).astype(np.int32)
    cond = jnp.asarray(rng.randn(1, cfg.decoder_adanorm_dim).astype(np.float32))

    fwd = jax.jit(codec_decode_spec, static_argnums=0)
    spec_a, flen_a = fwd(cfg, w, jnp.asarray(codes)[None], jnp.asarray([n], jnp.int32), cond)

    padded = np.zeros(16, np.int32)
    padded[:n] = codes
    spec_b, flen_b = fwd(cfg, w, jnp.asarray(padded)[None], jnp.asarray([n], jnp.int32), cond)

    fa, fb = int(flen_a[0]), int(flen_b[0])
    assert fa == fb
    np.testing.assert_allclose(np.array(spec_a[0, :fa]), np.array(spec_b[0, :fa]),
                               rtol=1e-4, atol=1e-5)
    # padded region of the spec must be exactly zero
    assert np.array(spec_b[0, fb:]).max(initial=0.0) == 0.0


def test_batched_equals_individual(tiny_model):
    cfg, w, raw = tiny_model
    rng = np.random.RandomState(9)
    n1, n2 = 5, 12
    c1 = rng.randint(0, cfg.vocab_size, size=n1).astype(np.int32)
    c2 = rng.randint(0, cfg.vocab_size, size=n2).astype(np.int32)
    e1 = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)
    e2 = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32)

    N = 12
    tokens = np.zeros((2, N), np.int32)
    tokens[0, :n1] = c1
    tokens[1, :n2] = c2
    lengths = jnp.asarray([n1, n2], jnp.int32)
    cond = jnp.asarray(np.stack([e1, e2]))

    fwd = jax.jit(codec_decode_spec, static_argnums=0)
    spec_b, flen_b = fwd(cfg, w, jnp.asarray(tokens), lengths, cond)

    for i, (c, e, n) in enumerate([(c1, e1, n1), (c2, e2, n2)]):
        pad = np.zeros((1, N), np.int32)
        pad[0, :n] = c
        spec_i, flen_i = fwd(cfg, w, jnp.asarray(pad), jnp.asarray([n], jnp.int32),
                             jnp.asarray(e)[None])
        f = int(flen_i[0])
        assert int(flen_b[i]) == f
        np.testing.assert_allclose(np.array(spec_b[i, :f]), np.array(spec_i[0, :f]),
                                   rtol=1e-4, atol=1e-5)


def test_wave_upsampler_matches_oracle(tiny_ups_model):
    cfg, w, raw = tiny_ups_model
    rng = np.random.RandomState(11)
    n = 6
    codes = rng.randint(0, cfg.vocab_size, size=n).astype(np.int32)
    cond = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32) * 0.5

    ref_spec = oracle.decode_spec(_oracle_cfg(cfg), raw, codes, cond)
    fwd = jax.jit(codec_decode_spec, static_argnums=0)
    spec, flen = fwd(cfg, w, jnp.asarray(codes)[None], jnp.asarray([n], jnp.int32),
                     jnp.asarray(cond)[None])
    f = int(flen[0])
    assert f == ref_spec.shape[0]
    np.testing.assert_allclose(np.array(spec[0, :f]), ref_spec, rtol=2e-3, atol=2e-4)


def test_441khz_geometry_end_to_end(tmp_path):
    """The 44.1 kHz v2 model family (scripts/README.md: samples_per_token
    1764 with a wave upsampler) through the full synthesize path at tiny
    dims but the real geometry ratios: spt 1764 = hop 441 x 4 stft frames
    per token, upsampler total factor 4 (2x2), and an n_fft the hop does
    not divide — oracle-checked end to end."""
    cfg = tiny_codec_config(
        sample_rate=44100, samples_per_token=1764, hop_length=441, n_fft=1024,
        wave_upsampler_factors=(2, 2), wave_upsampler_kernel_sizes=(4, 4),
    )
    path = tmp_path / "tiny441.gguf"
    write_synthetic_miocodec_gguf(str(path), cfg, seed=3)
    cfg, w = load_miocodec(str(path))
    assert cfg.samples_per_token == 1764 and cfg.wave_upsampler_total_factor == 4
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    w = jax.tree.map(jnp.asarray, w)

    rng = np.random.RandomState(7)
    n = 5
    codes = rng.randint(0, cfg.vocab_size, size=n).astype(np.int32)
    cond = rng.randn(cfg.decoder_adanorm_dim).astype(np.float32) * 0.5

    ref_spec = oracle.decode_spec(_oracle_cfg(cfg), raw, codes, cond)
    ref_audio = oracle.istft(ref_spec, cfg.n_fft, cfg.hop_length)

    audio, n_samples = jax.jit(codec_synthesize, static_argnums=0)(
        cfg, w, jnp.asarray(codes)[None], jnp.asarray([n], jnp.int32),
        jnp.asarray(cond)[None])
    got = np.array(audio[0, :int(n_samples[0])])
    assert got.shape == ref_audio.shape
    peak = np.abs(ref_audio).max()
    if peak > 0.98:
        ref_audio = ref_audio * (0.95 / peak)
    np.testing.assert_allclose(got, ref_audio, rtol=5e-3, atol=5e-4)


def test_global_encoder_runs_and_is_finite(tiny_model):
    cfg, w, raw = tiny_model
    rng = np.random.RandomState(2)
    T = 20
    ssl = jnp.asarray(rng.randn(1, T, cfg.global_encoder_input_channels).astype(np.float32))
    emb = jax.jit(encode_global_embedding, static_argnums=0)(
        cfg, w, ssl, jnp.asarray([T], jnp.int32))
    assert emb.shape == (1, cfg.global_encoder_output_channels)
    assert np.isfinite(np.array(emb)).all()
    # padding invariance
    ssl_pad = jnp.concatenate([ssl, jnp.ones((1, 12, ssl.shape[-1]))], axis=1)
    emb2 = jax.jit(encode_global_embedding, static_argnums=0)(
        cfg, w, ssl_pad, jnp.asarray([T], jnp.int32))
    np.testing.assert_allclose(np.array(emb), np.array(emb2), rtol=1e-4, atol=1e-5)


def test_istft_nondivisible_hop_matches_oracle():
    """OLA with hop that does not divide n_fft (44.1 kHz model family)."""
    import oracle_miocodec as oracle
    from miotts_tpu.ops.istft import spec_to_audio

    rng = np.random.RandomState(3)
    n_fft, hop, L = 48, 20, 7
    spec = (rng.randn(L, n_fft + 2) * 0.3).astype(np.float32)
    ref = oracle.istft(spec.astype(np.float64), n_fft, hop)
    got = spec_to_audio(jnp.asarray(spec)[None], jnp.asarray([L], jnp.int32),
                        n_fft, hop)
    got = np.array(got[0])
    assert got.size == ref.size
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_global_encoder_matches_oracle(tiny_model):
    cfg, w, raw = tiny_model
    rng = np.random.RandomState(8)
    T = 17
    ssl = (rng.randn(T, cfg.global_encoder_input_channels) * 0.5).astype(np.float32)
    ref = oracle.encode_global_embedding(raw, cfg.global_encoder_layers, ssl)
    got = jax.jit(encode_global_embedding, static_argnums=0)(
        cfg, w, jnp.asarray(ssl)[None], jnp.asarray([T], jnp.int32))
    np.testing.assert_allclose(np.array(got[0]), ref, rtol=2e-3, atol=2e-4)
