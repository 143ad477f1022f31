"""WavLM Base+ SSL extractor (2 layers) for voice cloning.

TPU-native re-design of ``wavlm-extractor.cpp``: one jitted, length-bucketed
forward over padded 16 kHz waveforms — conv feature stack (:664-681),
feature projection + grouped positional conv (:684-739), and transformer
layers with WavLM's GRU-gated relative-position bias (:762-851). The SSL
output is the mean of the layer outputs (:853-864); the non-finite fallback
ladder (ssl -> pre-transformer -> deterministic audio-stat features,
:1016-1076) is reproduced host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader
from ..ops.convs import conv1d_strided
from ..ops.norms import layer_norm
from ..runtime.audio_io import load_audio, resample_linear

Pytree = Any


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    sample_rate: int = 16000
    n_layers: int = 2
    n_heads: int = 12
    head_dim: int = 64
    embed_dim: int = 768
    num_buckets: int = 320
    max_distance: int = 800
    norm_eps: float = 1e-5
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_conv_groups: int = 16
    pos_conv_kernel: int = 128

    def conv_out_len(self, n_in: int) -> int:
        """wavlm_conv_stack_out_len (wavlm-extractor.cpp:242-255)."""
        n = max(1, n_in)
        for k, s in zip(self.conv_kernel, self.conv_stride):
            if n < k:
                return 1
            n = max(1, (n - k) // s + 1)
        return n


def load_wavlm(path: str, dtype=np.float32) -> tuple[WavLMConfig, Pytree]:
    r = GGUFReader(path)
    d = WavLMConfig()
    kernels = tuple(r.get_u32(f"wavlm.feat.conv{i}.kernel", d.conv_kernel[i]) for i in range(7))
    strides = tuple(r.get_u32(f"wavlm.feat.conv{i}.stride", d.conv_stride[i]) for i in range(7))
    cfg = WavLMConfig(
        sample_rate=r.get_u32("wavlm.sample_rate", d.sample_rate),
        n_layers=r.get_u32("wavlm.n_layers", d.n_layers),
        n_heads=r.get_u32("wavlm.n_heads", d.n_heads),
        head_dim=r.get_u32("wavlm.head_dim", d.head_dim),
        embed_dim=r.get_u32("wavlm.embed_dim", d.embed_dim),
        num_buckets=r.get_u32("wavlm.num_buckets", d.num_buckets),
        max_distance=r.get_u32("wavlm.max_distance", d.max_distance),
        norm_eps=r.get_f32("wavlm.layer_norm_eps", d.norm_eps),
        conv_kernel=kernels,
        conv_stride=strides,
    )

    def t(name, transpose=False):
        arr = r.tensor(name, dtype=dtype)
        return np.ascontiguousarray(arr.T) if transpose else arr

    w: dict[str, Any] = {
        "conv0_norm_w": t("wavlm.feat.conv0.norm.weight"),
        "conv0_norm_b": t("wavlm.feat.conv0.norm.bias"),
        "conv_w": [t(f"wavlm.feat.conv{i}.weight") for i in range(7)],  # [out,in,k]
        "proj_norm_w": t("wavlm.proj.norm.weight"),
        "proj_norm_b": t("wavlm.proj.norm.bias"),
        "proj_w": t("wavlm.proj.weight", transpose=True),
        "proj_b": t("wavlm.proj.bias"),
        "pos_conv_w": t("wavlm.pos_conv.weight"),  # [768, 48, 128] grouped
        "pos_conv_b": t("wavlm.pos_conv.bias"),
        "transformer_norm_w": t("wavlm.transformer.norm.weight"),
        "transformer_norm_b": t("wavlm.transformer.norm.bias"),
        "rel_embed": t("wavlm.layer.0.attn.rel_embed.weight"),  # [buckets, heads]
    }
    layers = []
    for i in range(cfg.n_layers):
        p = f"wavlm.layer.{i}"
        layers.append({
            "in_proj_w": t(f"{p}.attn.in_proj.weight", transpose=True),  # [768, 2304]
            "in_proj_b": t(f"{p}.attn.in_proj.bias"),
            "out_proj_w": t(f"{p}.attn.out_proj.weight", transpose=True),
            "out_proj_b": t(f"{p}.attn.out_proj.bias"),
            "gru_w": t(f"{p}.attn.gru.weight", transpose=True),  # [64, 8]
            "gru_b": t(f"{p}.attn.gru.bias"),
            "gru_const": t(f"{p}.attn.gru_const").reshape(-1),  # [heads]
            "norm1_w": t(f"{p}.norm1.weight"),
            "norm1_b": t(f"{p}.norm1.bias"),
            "ffn_w1": t(f"{p}.ffn.w1.weight", transpose=True),
            "ffn_b1": t(f"{p}.ffn.w1.bias"),
            "ffn_w2": t(f"{p}.ffn.w2.weight", transpose=True),
            "ffn_b2": t(f"{p}.ffn.w2.bias"),
            "norm2_w": t(f"{p}.norm2.weight"),
            "norm2_b": t(f"{p}.norm2.bias"),
        })
    w["layers"] = layers
    r.close()
    return cfg, w


# ---------------------------------------------------------------------------
# relative position buckets
# ---------------------------------------------------------------------------

def relative_position_bucket(relative_pos: jnp.ndarray, num_buckets: int,
                             max_distance: int) -> jnp.ndarray:
    """Vectorized wavlm_relative_position_bucket (wavlm-extractor.cpp:257-279)."""
    half = num_buckets // 2
    max_exact = half // 2
    rel = relative_pos.astype(jnp.int32)
    base = jnp.where(rel > 0, half, 0)
    n = jnp.abs(rel)
    nf = jnp.maximum(n, 1).astype(jnp.float32)
    denom = np.log(float(max_distance) / float(max_exact))
    log_val = max_exact + jnp.floor(
        jnp.log(nf / float(max_exact)) / denom * (half - max_exact)
    ).astype(jnp.int32)
    log_val = jnp.minimum(log_val, half - 1)
    return base + jnp.where(n < max_exact, n, log_val)


def _build_raw_bias(cfg: WavLMConfig, rel_embed: jnp.ndarray, seq: int) -> jnp.ndarray:
    """[seq_q, seq_k, heads] bias from the layer-0 embedding table
    (wavlm-extractor.cpp:894-912): bucket of (k - q)."""
    q = jnp.arange(seq, dtype=jnp.int32)
    rel = q[None, :] - q[:, None]  # [q, k] = k - q
    buckets = relative_position_bucket(rel, cfg.num_buckets, cfg.max_distance)
    return rel_embed[buckets]  # [q, k, heads]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def wavlm_forward(
    cfg: WavLMConfig,
    w: Pytree,
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """wav: [B, S] 16 kHz mono (padded). Returns (ssl [B, T, 768],
    ssl_pre [B, T, 768], frame_lengths [B])."""
    with jax.default_matmul_precision("float32"):
        return _wavlm_forward_impl(cfg, w, wav, wav_lengths)


def _wavlm_forward_impl(cfg, w, wav, wav_lengths):
    B, S = wav.shape
    x = wav[:, :, None].astype(jnp.float32)  # [B, S, 1]
    cur_len = wav_lengths.astype(jnp.int32)

    def mask(x, length):
        t = jnp.arange(x.shape[1], dtype=jnp.int32)
        return x * (t[None, :] < length[:, None])[:, :, None].astype(x.dtype)

    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        x = conv1d_strided(x, w["conv_w"][i], None, stride=s, pad=0)
        cur_len = jnp.maximum((cur_len - k) // s + 1, 1)
        x = mask(x, cur_len)
        if i == 0:
            # GroupNorm(groups=channels): per-channel stats over valid time
            xf = x.astype(jnp.float32)
            m = (jnp.arange(x.shape[1])[None, :] < cur_len[:, None]).astype(jnp.float32)[:, :, None]
            cnt = jnp.maximum(cur_len.astype(jnp.float32), 1.0)[:, None, None]
            mean = jnp.sum(xf * m, axis=1, keepdims=True) / cnt
            var = jnp.sum(jnp.square(xf - mean) * m, axis=1, keepdims=True) / cnt
            x = (xf - mean) * jax.lax.rsqrt(var + cfg.norm_eps)
            x = x * w["conv0_norm_w"] + w["conv0_norm_b"]
            x = mask(x, cur_len)
        x = jax.nn.gelu(x, approximate=True)  # ggml_gelu = tanh approximation
        x = mask(x, cur_len)

    seq_len = cur_len
    x = layer_norm(x, w["proj_norm_w"], w["proj_norm_b"], eps=cfg.norm_eps)
    x = x @ w["proj_w"] + w["proj_b"]  # [B, T, 768]
    x = mask(x, seq_len)

    # grouped positional conv k=128 pad=64 groups=16, crop to seq, GELU, add
    T = x.shape[1]
    kp = cfg.pos_conv_kernel
    groups = cfg.pos_conv_groups
    w_pos = jnp.transpose(w["pos_conv_w"], (2, 1, 0))  # [k, in/groups, out]
    pos = jax.lax.conv_general_dilated(
        x, w_pos.astype(x.dtype), window_strides=(1,), padding=[(kp // 2, kp // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    pos = pos[:, :T, :] + w["pos_conv_b"]  # crop the extra trailing frame
    pos = jax.nn.gelu(pos, approximate=True)
    pos = mask(pos, seq_len)
    x = x + pos
    x = layer_norm(x, w["transformer_norm_w"], w["transformer_norm_b"], eps=cfg.norm_eps)
    ssl_pre = mask(x, seq_len)
    x = ssl_pre

    raw_bias = _build_raw_bias(cfg, w["rel_embed"], T)  # [q, k, heads]
    valid_k = (jnp.arange(T, dtype=jnp.int32)[None, :] < seq_len[:, None])  # [B, k]
    kmask = valid_k[:, None, None, :] | jnp.eye(T, dtype=bool)[None, None, :, :]

    H, HD = cfg.n_heads, cfg.head_dim
    dim = cfg.embed_dim
    scale = 1.0 / np.sqrt(HD)

    ssl_sum = None
    for l in w["layers"]:
        # GRU-style gate from the layer input, per (query, head)
        qh = x.reshape(B, T, H, HD)
        g = jnp.einsum("bthd,dg->bthg", qh, l["gru_w"]) + l["gru_b"]  # [B,T,H,8]
        g0 = jax.nn.sigmoid(jnp.sum(g[..., :4], axis=-1))
        g1 = jax.nn.sigmoid(jnp.sum(g[..., 4:], axis=-1))
        gate = g0 * (g1 * l["gru_const"] - 1.0) + 2.0  # [B, T(q), H]
        bias = raw_bias[None] * gate[:, :, None, :]  # [B, q, k, H]

        qkv = x @ l["in_proj_w"] + l["in_proj_b"]  # [B, T, 3*dim]
        q = qkv[..., :dim].reshape(B, T, H, HD)
        k = qkv[..., dim:2 * dim].reshape(B, T, H, HD)
        v = qkv[..., 2 * dim:].reshape(B, T, H, HD)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale
        scores = scores + jnp.transpose(bias, (0, 3, 1, 2)).astype(jnp.float32)
        scores = jnp.where(kmask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        att = att.reshape(B, T, dim).astype(x.dtype)
        h = x + (att @ l["out_proj_w"] + l["out_proj_b"])

        n1 = layer_norm(h, l["norm1_w"], l["norm1_b"], eps=cfg.norm_eps)
        ff = jax.nn.gelu(n1 @ l["ffn_w1"] + l["ffn_b1"], approximate=True)
        ff = ff @ l["ffn_w2"] + l["ffn_b2"]
        x = layer_norm(h + ff, l["norm2_w"], l["norm2_b"], eps=cfg.norm_eps)
        ssl_sum = x if ssl_sum is None else ssl_sum + x

    ssl = ssl_sum * (1.0 / max(1, cfg.n_layers))
    return mask(ssl, seq_len), ssl_pre, seq_len


# ---------------------------------------------------------------------------
# host-side extractor
# ---------------------------------------------------------------------------

_WAV_BUCKETS = (8000, 16000, 32000, 64000, 128000, 200000, 320000, 480000)


def _audio_stat_fallback(wav16k: np.ndarray, embed: int) -> np.ndarray:
    """Deterministic audio-stat pseudo-features (wavlm-extractor.cpp:1039-1071)."""
    hop, win = 320, 400
    total = len(wav16k)
    fb_frames = max(1, (total + hop - 1) // hop)
    out = np.zeros((fb_frames, embed), np.float32)
    d = np.arange(embed)
    alpha = 0.15 + 0.85 * ((d % 31) / 30.0)
    beta = ((d % 7) + 1) / 7.0
    sign = np.where((d & 1) == 1, 1.0, -1.0)
    for t in range(fb_frames):
        s0 = min(total - 1, t * hop)
        s1 = min(total, s0 + win)
        a = np.abs(wav16k[s0:s1].astype(np.float64))
        n = max(1, s1 - s0)
        mean_abs = a.sum() / n
        rms = np.sqrt((a * a).sum() / n)
        peak = a.max() if a.size else 0.0
        out[t] = ((alpha * rms + (1 - alpha) * mean_abs) * beta + 0.05 * peak * sign)
    return out


class WavLMExtractor:
    """Host orchestration: audio decode/normalize/resample + jitted forward +
    the reference's non-finite fallback ladder."""

    def __init__(self, path: str, sharding=None):
        from ..runtime.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.config, weights = load_wavlm(path)
        from ..runtime.device_dequant import device_put_packed

        # one packed transfer; ``sharding`` places the leaves directly
        # (an sp pipeline passes its mesh-replicated sharding)
        self.weights = device_put_packed(weights, sharding=sharding)
        import functools

        self._fwd = jax.jit(functools.partial(wavlm_forward, self.config))

    def estimate_ssl_frames(self, source_rate: int, max_seconds: float = 20.0) -> int:
        n_src = max(1, round(source_rate * (max_seconds if max_seconds > 0 else 20.0)))
        n_wav = max(1, round(n_src * self.config.sample_rate / source_rate))
        return self.config.conv_out_len(n_wav)

    def preprocess_reference(self, audio_path: str, source_rate: int,
                             max_seconds: float = 20.0) -> np.ndarray:
        """Host side of reference processing: decode, peak-normalize
        (wavlm-extractor.cpp:205-216), resample to the SSL rate."""
        wav_src, _ = load_audio(audio_path, target_rate=source_rate,
                                max_seconds=max_seconds if max_seconds > 0 else None)
        if wav_src.size == 0:
            raise ValueError("reference audio is empty")
        wav_src = wav_src / (np.abs(wav_src).max() + 1e-8)
        wav16k = resample_linear(wav_src, source_rate, self.config.sample_rate)
        if wav16k.size == 0:
            raise ValueError("resampling produced empty waveform")
        return wav16k

    def pick_wav_bucket(self, n: int) -> int:
        return next((b for b in _WAV_BUCKETS if n <= b),
                    ((n + 79999) // 80000) * 80000)

    def extract_ssl_features(
        self,
        audio_path: str,
        source_rate: int,
        max_seconds: float = 20.0,
    ) -> tuple[np.ndarray, int]:
        """Returns (ssl [T, embed], n_frames). May substitute fallback
        features like the reference (which still returns success)."""
        return self.extract_from_wav16k(
            self.preprocess_reference(audio_path, source_rate, max_seconds))

    def extract_from_wav16k(self, wav16k: np.ndarray) -> tuple[np.ndarray, int]:
        n = int(wav16k.size)
        bucket = next((b for b in _WAV_BUCKETS if n <= b), ((n + 79999) // 80000) * 80000)
        padded = np.zeros((1, bucket), np.float32)
        padded[0, :n] = wav16k
        ssl, ssl_pre, fl = self._fwd(self.weights, jnp.asarray(padded),
                                     jnp.asarray([n], jnp.int32))
        n_frames = int(fl[0])
        ssl = np.asarray(ssl[0, :n_frames], np.float32)
        if np.isfinite(ssl).all():
            return ssl, n_frames
        ssl_pre = np.asarray(ssl_pre[0, :n_frames], np.float32)
        if np.isfinite(ssl_pre).all():
            return ssl_pre, n_frames
        fb = _audio_stat_fallback(wav16k, self.config.embed_dim)
        return fb, fb.shape[0]
