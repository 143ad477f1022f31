"""WavLM extractor tests: numpy oracle parity, bucket function, padding
invariance, fallback ladder."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.models.wavlm import (
    WavLMConfig, WavLMExtractor, _audio_stat_fallback, load_wavlm,
    relative_position_bucket, wavlm_forward,
)
from miotts_tpu.testing import write_synthetic_wavlm_gguf


def ref_bucket(relative_pos: int, num_buckets: int, max_distance: int) -> int:
    """Direct port of wavlm_relative_position_bucket (wavlm-extractor.cpp:257-279)."""
    relative_buckets = 0
    half = num_buckets // 2
    if relative_pos > 0:
        relative_buckets += half
    n = abs(relative_pos)
    max_exact = half // 2
    if n < max_exact:
        return relative_buckets + n
    denom = math.log(max_distance / max_exact)
    val = max_exact + int(math.floor(math.log(n / max_exact) / denom * (half - max_exact)))
    return relative_buckets + min(val, half - 1)


def test_bucket_function_matches_reference():
    num_buckets, max_distance = 320, 800
    rel = np.arange(-1200, 1201)
    got = np.array(relative_position_bucket(jnp.asarray(rel), num_buckets, max_distance))
    expect = np.array([ref_bucket(int(r), num_buckets, max_distance) for r in rel])
    np.testing.assert_array_equal(got, expect)


@pytest.fixture(scope="module")
def tiny_wavlm(tmp_path_factory):
    path = tmp_path_factory.mktemp("wavlm") / "tiny_wavlm.gguf"
    write_synthetic_wavlm_gguf(str(path), seed=0)
    cfg, w = load_wavlm(str(path))
    with GGUFReader(path) as r:
        raw = {name: np.array(r.tensor(name)) for name in r.tensors}
    return str(path), cfg, jax.tree.map(jnp.asarray, w), raw


def _oracle_wavlm(cfg: WavLMConfig, raw: dict, wav: np.ndarray) -> np.ndarray:
    """Independent numpy WavLM forward (single example, unpadded)."""
    def ln(x, g, b, eps=1e-5):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) / np.sqrt(v + eps) * g + b

    def gelu(x):
        return 0.5 * x * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))

    x = wav[:, None].astype(np.float64)  # [S, 1]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        w = raw[f"wavlm.feat.conv{i}.weight"]  # [out, in, k]
        T = (len(x) - k) // s + 1
        y = np.zeros((T, w.shape[0]))
        for t in range(T):
            seg = x[t * s:t * s + k]  # [k, in]
            y[t] = np.einsum("kc,ock->o", seg, w)
        x = y
        if i == 0:
            m = x.mean(axis=0, keepdims=True)
            v = ((x - m) ** 2).mean(axis=0, keepdims=True)
            x = (x - m) / np.sqrt(v + cfg.norm_eps)
            x = x * raw["wavlm.feat.conv0.norm.weight"] + raw["wavlm.feat.conv0.norm.bias"]
        x = gelu(x)

    x = ln(x, raw["wavlm.proj.norm.weight"], raw["wavlm.proj.norm.bias"], cfg.norm_eps)
    x = x @ raw["wavlm.proj.weight"].T + raw["wavlm.proj.bias"]

    T, E = x.shape
    wp = raw["wavlm.pos_conv.weight"]  # [out, in/groups, 128]
    groups = 16 if E % 16 == 0 else cfg.n_heads
    ipg = E // groups
    opg = E // groups
    kp = wp.shape[-1]
    pad = kp // 2
    xp = np.zeros((T + 2 * pad, E))
    xp[pad:pad + T] = x
    pos = np.zeros((T + 2 * pad - kp + 1, E))
    for g in range(groups):
        xg = xp[:, g * ipg:(g + 1) * ipg]
        for o in range(opg):
            wgo = wp[g * opg + o]  # [in/groups, k]
            for t in range(pos.shape[0]):
                pos[t, g * opg + o] = np.sum(xg[t:t + kp].T * wgo)
    pos = pos[:T] + raw["wavlm.pos_conv.bias"]
    pos = gelu(pos)
    x = x + pos
    x = ln(x, raw["wavlm.transformer.norm.weight"], raw["wavlm.transformer.norm.bias"], cfg.norm_eps)

    rel = raw["wavlm.layer.0.attn.rel_embed.weight"]  # [buckets, heads]
    raw_bias = np.zeros((T, T, cfg.n_heads))
    for q in range(T):
        for k2 in range(T):
            raw_bias[q, k2] = rel[ref_bucket(k2 - q, cfg.num_buckets, cfg.max_distance)]

    H, HD = cfg.n_heads, cfg.head_dim
    ssl_sum = np.zeros_like(x)
    for i in range(cfg.n_layers):
        p = f"wavlm.layer.{i}"
        qh = x.reshape(T, H, HD)
        g = qh @ raw[f"{p}.attn.gru.weight"].T + raw[f"{p}.attn.gru.bias"]  # [T,H,8]
        g0 = 1 / (1 + np.exp(-g[..., :4].sum(-1)))
        g1 = 1 / (1 + np.exp(-g[..., 4:].sum(-1)))
        gate = g0 * (g1 * raw[f"{p}.attn.gru_const"].reshape(-1) - 1.0) + 2.0  # [T,H]
        bias = raw_bias * gate[:, None, :]  # [q,k,H]

        qkv = x @ raw[f"{p}.attn.in_proj.weight"].T + raw[f"{p}.attn.in_proj.bias"]
        E3 = E
        q = qkv[:, :E3].reshape(T, H, HD)
        kk = qkv[:, E3:2 * E3].reshape(T, H, HD)
        v = qkv[:, 2 * E3:].reshape(T, H, HD)
        att = np.zeros((T, H, HD))
        for h in range(H):
            scores = q[:, h] @ kk[:, h].T / np.sqrt(HD) + bias[:, :, h]
            e = np.exp(scores - scores.max(-1, keepdims=True))
            pr = e / e.sum(-1, keepdims=True)
            att[:, h] = pr @ v[:, h]
        h_out = x + (att.reshape(T, E) @ raw[f"{p}.attn.out_proj.weight"].T
                     + raw[f"{p}.attn.out_proj.bias"])
        n1 = ln(h_out, raw[f"{p}.norm1.weight"], raw[f"{p}.norm1.bias"], cfg.norm_eps)
        ff = gelu(n1 @ raw[f"{p}.ffn.w1.weight"].T + raw[f"{p}.ffn.w1.bias"])
        ff = ff @ raw[f"{p}.ffn.w2.weight"].T + raw[f"{p}.ffn.w2.bias"]
        x = ln(h_out + ff, raw[f"{p}.norm2.weight"], raw[f"{p}.norm2.bias"], cfg.norm_eps)
        ssl_sum += x
    return ssl_sum / cfg.n_layers


def test_forward_matches_oracle(tiny_wavlm):
    path, cfg, w, raw = tiny_wavlm
    rng = np.random.RandomState(0)
    n = 400
    wav = (rng.randn(n) * 0.3).astype(np.float32)
    ref = _oracle_wavlm(cfg, raw, wav)

    ssl, ssl_pre, fl = jax.jit(wavlm_forward, static_argnums=0)(
        cfg, w, jnp.asarray(wav)[None], jnp.asarray([n], jnp.int32))
    T = int(fl[0])
    assert T == ref.shape[0]
    np.testing.assert_allclose(np.array(ssl[0, :T]), ref, rtol=3e-3, atol=3e-4)


def test_padding_invariance(tiny_wavlm):
    path, cfg, w, raw = tiny_wavlm
    rng = np.random.RandomState(1)
    n = 300
    wav = (rng.randn(n) * 0.3).astype(np.float32)
    fwd = jax.jit(wavlm_forward, static_argnums=0)
    a, _, fa = fwd(cfg, w, jnp.asarray(wav)[None], jnp.asarray([n], jnp.int32))
    padded = np.zeros(512, np.float32)
    padded[:n] = wav
    b, _, fb = fwd(cfg, w, jnp.asarray(padded)[None], jnp.asarray([n], jnp.int32))
    T = int(fa[0])
    assert int(fb[0]) == T
    np.testing.assert_allclose(np.array(a[0, :T]), np.array(b[0, :T]), rtol=1e-4, atol=1e-5)


def test_extractor_end_to_end(tiny_wavlm, tmp_path):
    path, cfg, w, raw = tiny_wavlm
    from miotts_tpu.runtime.audio_io import save_wav16

    rng = np.random.RandomState(2)
    sr = 24000
    audio = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
             + 0.1 * rng.randn(sr)).astype(np.float32)
    wav_path = tmp_path / "ref.wav"
    save_wav16(wav_path, audio, sr)

    ext = WavLMExtractor(path)
    ssl, n_frames = ext.extract_ssl_features(str(wav_path), source_rate=sr, max_seconds=20.0)
    assert ssl.shape == (n_frames, cfg.embed_dim)
    assert np.isfinite(ssl).all()
    assert n_frames == ext.config.conv_out_len(16000)


def test_audio_stat_fallback_reference_math():
    rng = np.random.RandomState(3)
    wav = rng.randn(1000).astype(np.float32)
    fb = _audio_stat_fallback(wav, 24)
    assert fb.shape == (4, 24)  # ceil(1000/320)
    # spot-check one cell against the scalar formula (wavlm-extractor.cpp:1047-1070)
    t, d = 2, 5
    s0 = min(999, t * 320)
    s1 = min(1000, s0 + 400)
    a = np.abs(wav[s0:s1].astype(np.float64))
    mean_abs = a.mean()
    rms = np.sqrt((a * a).mean())
    peak = a.max()
    alpha = 0.15 + 0.85 * ((d % 31) / 30.0)
    beta = ((d % 7) + 1) / 7.0
    v = (alpha * rms + (1 - alpha) * mean_abs) * beta + 0.05 * peak * (1.0 if d & 1 else -1.0)
    np.testing.assert_allclose(fb[t, d], v, rtol=1e-6)
