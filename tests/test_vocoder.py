"""MioVocoder tests: numpy-oracle parity, padding invariance, end-to-end
mel-mode synthesis."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.miocodec import codec_synthesize, load_miocodec
from miotts_tpu.models.vocoder import julius_lowpass_kernel, vocoder_decode
from miotts_tpu.testing import tiny_codec_config, write_synthetic_mel_vocoder_gguf

import oracle_vocoder as oracle


@pytest.fixture(scope="module")
def mel_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("voc") / "mel_vocoder.gguf"
    cfg = tiny_codec_config(
        model_type=1, n_mels=12, n_fft=64, hop_length=16, samples_per_token=32,
        resnet_blocks=0,
        vocoder_upsample_rates=(4, 2, 2), vocoder_num_kernels=2,
    )
    write_synthetic_mel_vocoder_gguf(str(path), cfg, seed=0)
    loaded, w = load_miocodec(str(path))
    assert loaded.has_vocoder and loaded.model_type == 1
    assert loaded.vocoder_upsample_rates == (4, 2, 2)
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    return loaded, jax.tree.map(jnp.asarray, w), raw


def test_julius_kernel_matches_oracle():
    for cutoff in (0.5 / 4, 0.5 / 2, 0.25):
        got = julius_lowpass_kernel(round(cutoff, 9))
        expect = oracle.julius_lowpass_kernel(cutoff)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-7)


def test_vocoder_matches_oracle(mel_model):
    cfg, w, raw = mel_model
    rng = np.random.RandomState(0)
    T = 9
    mel_ct = (rng.randn(cfg.n_mels, T) * 0.5).astype(np.float32)  # [C, T]

    ocfg = {
        "mel_postnet_layers": cfg.mel_postnet_layers,
        "norm_eps": cfg.norm_eps,
        "vocoder_upsample_rates": cfg.vocoder_upsample_rates,
        "vocoder_num_kernels": cfg.vocoder_num_kernels,
    }
    ref = oracle.decode_mel_to_audio(raw, ocfg, mel_ct)

    mel_btc = jnp.asarray(mel_ct.T)[None]  # [1, T, C]
    lengths = jnp.asarray([T], jnp.int32)

    audio, n_samples = jax.jit(lambda w, m, l: vocoder_decode(cfg, w, m, l))(
        w, mel_btc, lengths)
    n = int(n_samples[0])
    got = np.array(audio[0, :n])
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_vocoder_padding_invariance(mel_model):
    cfg, w, raw = mel_model
    rng = np.random.RandomState(1)
    T = 7
    mel = (rng.randn(1, T, cfg.n_mels) * 0.5).astype(np.float32)
    fwd = jax.jit(lambda w, m, l: vocoder_decode(cfg, w, m, l))
    a, na = fwd(w, jnp.asarray(mel), jnp.asarray([T], jnp.int32))
    padded = np.zeros((1, 16, cfg.n_mels), np.float32)
    padded[:, :T] = mel
    b, nb = fwd(w, jnp.asarray(padded), jnp.asarray([T], jnp.int32))
    n = int(na[0])
    assert int(nb[0]) == n
    np.testing.assert_allclose(np.array(a[0, :n]), np.array(b[0, :n]),
                               rtol=1e-4, atol=1e-5)


def test_vocoder_ragged_kernels_fused_matches_oracle(tmp_path, monkeypatch):
    """BigVGAN-style ragged per-resblock kernel sizes (3/5/7): the default
    per-branch loop matches the independent numpy oracle, and the opt-in
    channel-folded fused path (MIOTTS_VOCODER_FUSE=1, which zero-extends
    kernels to the slot max) is bit-consistent with it."""
    monkeypatch.setenv("MIOTTS_VOCODER_FUSE", "1")
    cfg = tiny_codec_config(
        model_type=1, n_mels=12, n_fft=64, hop_length=16, samples_per_token=32,
        resnet_blocks=0,
        vocoder_upsample_rates=(4, 2, 2), vocoder_num_kernels=3,
    )
    path = tmp_path / "ragged.gguf"
    write_synthetic_mel_vocoder_gguf(str(path), cfg, seed=5,
                                     resblock_kernels=(3, 5, 7))
    loaded, w = load_miocodec(str(path))
    w = jax.tree.map(jnp.asarray, w)
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    rng = np.random.RandomState(3)
    T = 8
    mel_ct = (rng.randn(loaded.n_mels, T) * 0.5).astype(np.float32)
    ocfg = {
        "mel_postnet_layers": loaded.mel_postnet_layers,
        "norm_eps": loaded.norm_eps,
        "vocoder_upsample_rates": loaded.vocoder_upsample_rates,
        "vocoder_num_kernels": loaded.vocoder_num_kernels,
    }
    ref = oracle.decode_mel_to_audio(raw, ocfg, mel_ct)
    mel_btc = jnp.asarray(mel_ct.T)[None]
    lengths = jnp.asarray([T], jnp.int32)

    audio, n = jax.jit(lambda w, m, l: vocoder_decode(loaded, w, m, l))(
        w, mel_btc, lengths)
    got = np.array(audio[0, : int(n[0])])
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)

    monkeypatch.delenv("MIOTTS_VOCODER_FUSE")
    audio2, n2 = jax.jit(lambda w, m, l: vocoder_decode(loaded, w, m, l))(
        w, mel_btc, lengths)
    assert int(n2[0]) == int(n[0])
    np.testing.assert_allclose(got, np.array(audio2[0, : int(n[0])]),
                               rtol=1e-5, atol=1e-6)


def test_fast_sincos_accuracy():
    """The in-kernel Cody-Waite + minimax sin/cos (the snake's fast path)
    stays within ~1e-7 of float64 numpy across the full clamp range,
    including quadrant boundaries and denormal-small arguments."""
    from miotts_tpu.ops.pallas.activation1d import (_SINCOS_CLAMP, fast_cos,
                                                    fast_sin)

    rng = np.random.RandomState(0)
    cl = float(_SINCOS_CLAMP)
    cases = [
        rng.uniform(-10, 10, 100000).astype(np.float32),
        rng.uniform(-cl, cl, 200000).astype(np.float32),
        (rng.randn(50000) * 1e-6).astype(np.float32),
        (np.arange(-8000, 8000) * (np.pi / 4)).astype(np.float32),
    ]
    for th in cases:
        s = np.asarray(fast_sin(jnp.asarray(th)))
        c = np.asarray(fast_cos(jnp.asarray(th)))
        np.testing.assert_allclose(s, np.sin(th.astype(np.float64)),
                                   atol=2e-7, rtol=0)
        np.testing.assert_allclose(c, np.cos(th.astype(np.float64)),
                                   atol=2e-7, rtol=0)


@pytest.mark.parametrize("k1,k2,T,C,B,bt", [
    (12, 12, 300, 16, 3, 64),   # even/even, ragged lengths, multi-tile
    (13, 15, 97, 8, 2, 64),     # odd filters, non-dividing T
    (16, 12, 520, 24, 2, 256),  # asymmetric filter pair
])
def test_fused_activation1d_matches_composite(k1, k2, T, C, B, bt):
    """The Pallas fused Activation1d (interpret mode on CPU) reproduces the
    unfused upsample->snake->downsample composite to f32 roundoff, including
    per-batch replicate-pad edges and length masking."""
    from miotts_tpu.models.vocoder import (adaa_snake_beta,
                                           downsample_activation,
                                           upsample_activation)
    from miotts_tpu.ops.masking import mask_time
    from miotts_tpu.ops.pallas.activation1d import fused_activation1d

    rng = np.random.RandomState(k1 + k2)
    f1 = np.hanning(k1 + 2)[1:-1].astype(np.float32)
    f1 /= f1.sum()
    f2 = np.hanning(k2 + 2)[1:-1].astype(np.float32)
    f2 /= f2.sum()
    lengths = rng.randint(1, T + 1, B).astype(np.int32)
    lengths[0] = T
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32)),
                  jnp.asarray(lengths))
    alpha = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    y, ln = upsample_activation(x, jnp.asarray(lengths), jnp.asarray(f1))
    y = adaa_snake_beta(y, ln, alpha, beta)
    y_ref, len_ref = downsample_activation(y, ln, jnp.asarray(f2))
    y_p, len_p = fused_activation1d(
        x, jnp.asarray(lengths), jnp.asarray(f1), alpha, beta,
        jnp.asarray(f2), block_t=bt, interpret=True)
    assert y_p.shape == y_ref.shape
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_ref))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=1e-5, atol=2e-6)


@pytest.mark.parametrize("cin,cout,k,d,res", [
    (16, 24, 3, 1, False), (16, 16, 3, 5, True), (32, 32, 7, 1, True),
])
def test_pallas_conv1d_matches_composite(cin, cout, k, d, res):
    """The Pallas shifted-matmul conv (interpret mode on CPU) reproduces
    mask_time(conv1d_zeropad(...)) [+ residual] including dilations,
    ragged lengths, and the zero-pad boundary."""
    from miotts_tpu.models.vocoder import conv1d_zeropad
    from miotts_tpu.ops.masking import mask_time
    from miotts_tpu.ops.pallas.conv1d import conv1d_same_pallas

    rng = np.random.RandomState(cin + k + d)
    B, T = 2, 300
    lengths = np.asarray([T, rng.randint(1, T)], np.int32)
    x = mask_time(jnp.asarray(rng.randn(B, T, cin).astype(np.float32)),
                  jnp.asarray(lengths))
    w = jnp.asarray((rng.randn(cout, cin, k) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(cout) * 0.05).astype(np.float32))
    r = (mask_time(jnp.asarray(rng.randn(B, T, cout).astype(np.float32)),
                   jnp.asarray(lengths)) if res else None)
    ref = mask_time(conv1d_zeropad(x, w, b, d, (k * d - d) // 2),
                    jnp.asarray(lengths))
    if res:
        ref = ref + r
    got = conv1d_same_pallas(x, jnp.asarray(lengths), w, b, d, residual=r,
                             block_t=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vocoder_fused_act1d_end_to_end(mel_model, monkeypatch):
    """Full vocoder forward with the fused Activation1d kernel active at
    every call site matches the default XLA composite path."""
    cfg, w, raw = mel_model
    rng = np.random.RandomState(7)
    T = 9
    mel = (rng.randn(1, T, cfg.n_mels) * 0.5).astype(np.float32)
    lengths = jnp.asarray([T], jnp.int32)
    monkeypatch.setenv("MIOTTS_ACT1D", "xla")
    a_ref, n_ref = jax.jit(lambda w, m, l: vocoder_decode(cfg, w, m, l))(
        w, jnp.asarray(mel), lengths)
    monkeypatch.setenv("MIOTTS_ACT1D", "interpret")
    a_fused, n_fused = jax.jit(lambda w, m, l: vocoder_decode(cfg, w, m, l))(
        w, jnp.asarray(mel), lengths)
    n = int(n_ref[0])
    assert int(n_fused[0]) == n
    np.testing.assert_allclose(np.array(a_fused[0, :n]),
                               np.array(a_ref[0, :n]), rtol=1e-4, atol=1e-5)


def test_mel_mode_end_to_end_synthesis(mel_model):
    cfg, w, raw = mel_model
    rng = np.random.RandomState(2)
    codes = rng.randint(0, cfg.vocab_size, 6).astype(np.int32)
    cond = jnp.asarray(rng.randn(1, cfg.decoder_adanorm_dim).astype(np.float32))
    audio, n_samples = jax.jit(codec_synthesize, static_argnums=0)(
        cfg, w, jnp.asarray(codes)[None], jnp.asarray([6], jnp.int32), cond)
    n = int(n_samples[0])
    # total upsampling = prod(rates) = 16 per mel frame; 6 codes -> 12 frames
    assert n == cfg.decoder_frames(6) * 16
    a = np.array(audio[0, :n])
    assert np.isfinite(a).all()
    assert np.abs(a).max() <= 1.0 + 1e-6
