"""MioCodec decoder: audio codes -> STFT spectrogram (or mel) -> waveform.

TPU-native redesign of the reference's GGML decode graph
(``miocodec-decoder.cpp:1079-1664``): one jitted, batched, length-bucketed
forward over ``[B, N]`` padded token batches (replacing per-request graph
rebuild + shape-keyed GPU graph copies). Transformer layers are stacked and
scanned; local window-65 attention uses a fused banded mask; all convolutions
and group norms are length-masked so a padded run is bit-equivalent in the
valid region to an unpadded one.

Weight names/shapes follow the GGUF contract emitted by the reference
converter (``scripts/convert_miocodec_to_gguf.py:385-588``). Linear weights
are stored pre-transposed to [in, out] for ``x @ w`` on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader
from ..ops.attention import banded_attention
from ..ops.convs import conv1d_same, conv1d_depthwise_same, conv_transpose1d, linear_interpolate
from ..ops.istft import spec_to_audio
from ..ops.masking import mask_time, time_mask
from ..ops.norms import adaln_modulate, layer_norm, masked_group_norm
from ..ops.rope import apply_rope

Pytree = Any


@dataclasses.dataclass(frozen=True)
class MioCodecConfig:
    """Hyperparameters, read from GGUF KV (miocodec-decoder.cpp:458-497)."""
    model_type: int = 0  # 0 = wave (stft), 1 = mel
    sample_rate: int = 24000
    n_fft: int = 1920
    hop_length: int = 480
    n_mels: int = 0
    samples_per_token: int = 960
    prenet_layers: int = 6
    prenet_dim: int = 768
    prenet_heads: int = 12
    prenet_ff: int = 2048
    prenet_window: int = 65
    decoder_layers: int = 8
    decoder_dim: int = 512
    decoder_heads: int = 8
    decoder_ff: int = 1536
    decoder_window: int = 65
    decoder_adanorm_dim: int = 128
    resnet_blocks: int = 2
    resnet_groups: int = 32
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    group_norm_eps: float = 1e-6
    dynamic_global: bool = True
    has_vocoder: bool = False
    mel_postnet_layers: int = 0
    mel_postnet_kernel_size: int = 0
    global_encoder_input_channels: int = 768
    global_encoder_output_channels: int = 128
    global_encoder_dim: int = 384
    global_encoder_intermediate_dim: int = 1152
    global_encoder_layers: int = 4
    wave_upsampler_factors: tuple[int, ...] = ()
    wave_upsampler_kernel_sizes: tuple[int, ...] = ()
    vocab_size: int = 12800
    vocoder_upsample_rates: tuple[int, ...] = ()
    vocoder_num_kernels: int = 0

    @property
    def wave_upsampler_total_factor(self) -> int:
        f = 1
        for x in self.wave_upsampler_factors:
            f *= x
        return f

    def stft_frames(self, n_tokens: int) -> int:
        return max(1, (n_tokens * self.samples_per_token) // max(1, self.hop_length))

    def decoder_frames(self, n_tokens: int) -> int:
        sf = self.stft_frames(n_tokens)
        tf = self.wave_upsampler_total_factor
        return max(1, sf // tf if tf > 1 else sf)


def choose_num_groups(groups: int, channels: int) -> int:
    """GroupNorm group-count adaptation (miocodec-decoder.cpp:1345-1351)."""
    g = max(1, min(groups, channels))
    while g > 1 and channels % g != 0:
        g -= 1
    return max(1, g)


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def _t(x: np.ndarray) -> np.ndarray:
    """Linear weight [out, in] -> [in, out] for x @ w."""
    return np.ascontiguousarray(x.T)


def _stack_blocks(reader_get, n: int, spec: dict[str, tuple[str, bool]],
                  optional: frozenset[str] = frozenset()) -> dict[str, np.ndarray | None]:
    out: dict[str, np.ndarray | None] = {}
    for field, (pattern, transpose) in spec.items():
        mats = []
        missing = False
        for i in range(n):
            name = pattern.format(i=i)
            arr = reader_get(name)
            if arr is None:
                missing = True
                break
            mats.append(_t(arr) if transpose else arr)
        if missing:
            if field not in optional:
                raise KeyError(f"missing tensor: {pattern.format(i=len(mats))}")
            out[field] = None
        else:
            out[field] = np.stack(mats)
    return out


_TRANSFORMER_SPEC = {
    "attn_norm_w": ("{p}.blk.{{i}}.attn_norm.weight", False),
    "attn_norm_b": ("{p}.blk.{{i}}.attn_norm.bias", False),
    "wq": ("{p}.blk.{{i}}.attn_q.weight", True),
    "wk": ("{p}.blk.{{i}}.attn_k.weight", True),
    "wv": ("{p}.blk.{{i}}.attn_v.weight", True),
    "wo": ("{p}.blk.{{i}}.attn_output.weight", True),
    "ffn_norm_w": ("{p}.blk.{{i}}.ffn_norm.weight", False),
    "ffn_norm_b": ("{p}.blk.{{i}}.ffn_norm.bias", False),
    "w1": ("{p}.blk.{{i}}.ffn_gate.weight", True),
    "w2": ("{p}.blk.{{i}}.ffn_down.weight", True),
    "w3": ("{p}.blk.{{i}}.ffn_up.weight", True),
}

_COND_SPEC = {
    "attn_cond_w": ("{p}.blk.{{i}}.attn_cond.weight", True),
    "attn_cond_b": ("{p}.blk.{{i}}.attn_cond.bias", False),
    "ffn_cond_w": ("{p}.blk.{{i}}.ffn_cond.weight", True),
    "ffn_cond_b": ("{p}.blk.{{i}}.ffn_cond.bias", False),
}

_RESNET_SPEC = {
    "norm1_w": ("{p}.{{i}}.norm1.weight", False),
    "norm1_b": ("{p}.{{i}}.norm1.bias", False),
    "conv1_w": ("{p}.{{i}}.conv1.weight", False),
    "conv1_b": ("{p}.{{i}}.conv1.bias", False),
    "norm2_w": ("{p}.{{i}}.norm2.weight", False),
    "norm2_b": ("{p}.{{i}}.norm2.bias", False),
    "conv2_w": ("{p}.{{i}}.conv2.weight", False),
    "conv2_b": ("{p}.{{i}}.conv2.bias", False),
}


def _spec_with_prefix(spec: dict, prefix: str) -> dict:
    return {k: (pat.format(p=prefix), tr) for k, (pat, tr) in spec.items()}


def load_miocodec(path: str, dtype=np.float32) -> tuple[MioCodecConfig, Pytree]:
    """Load a miocodec-dec GGUF (tensor contract: miocodec-decoder.cpp:507-819)."""
    r = GGUFReader(path)

    def kv_u(key, default):
        return r.get_u32(f"miocodec.{key}", default)

    def kv_f(key, default):
        return r.get_f32(f"miocodec.{key}", default)

    ups_layers = kv_u("wave_upsampler_layers", 0)
    ups_factors: tuple[int, ...] = ()
    ups_kernels: tuple[int, ...] = ()
    if ups_layers:
        ups_factors = tuple(int(x) for x in r.tensor("miocodec.wave_upsampler.factors"))
        ups_kernels = tuple(int(x) for x in r.tensor("miocodec.wave_upsampler.kernel_sizes"))

    voc_rates: tuple[int, ...] = ()
    voc_num_kernels = 0
    if kv_u("has_vocoder", 0):
        voc_rates = tuple(int(x) for x in r.tensor("miovocoder.upsample_rates"))
        voc_num_kernels = r.get_u32("miovocoder.num_kernels", 0)

    d = MioCodecConfig()
    cfg = MioCodecConfig(
        model_type=kv_u("model_type", d.model_type),
        sample_rate=kv_u("sample_rate", d.sample_rate),
        n_fft=kv_u("n_fft", d.n_fft),
        hop_length=kv_u("hop_length", d.hop_length),
        n_mels=kv_u("n_mels", d.n_mels),
        samples_per_token=kv_u("samples_per_token", d.samples_per_token),
        prenet_layers=kv_u("prenet_layers", d.prenet_layers),
        prenet_dim=kv_u("prenet_dim", d.prenet_dim),
        prenet_heads=kv_u("prenet_heads", d.prenet_heads),
        prenet_ff=kv_u("prenet_ff", d.prenet_ff),
        prenet_window=kv_u("prenet_window", d.prenet_window),
        decoder_layers=kv_u("decoder_layers", d.decoder_layers),
        decoder_dim=kv_u("decoder_dim", d.decoder_dim),
        decoder_heads=kv_u("decoder_heads", d.decoder_heads),
        decoder_ff=kv_u("decoder_ff", d.decoder_ff),
        decoder_window=kv_u("decoder_window", d.decoder_window),
        decoder_adanorm_dim=kv_u("decoder_adanorm_dim", d.decoder_adanorm_dim),
        resnet_blocks=kv_u("resnet_blocks", d.resnet_blocks),
        resnet_groups=kv_u("resnet_groups", d.resnet_groups),
        rope_theta=kv_f("rope_theta", d.rope_theta),
        norm_eps=kv_f("norm_eps", d.norm_eps),
        group_norm_eps=kv_f("group_norm_eps", d.group_norm_eps),
        dynamic_global=bool(kv_u("dynamic_global", 1)),
        has_vocoder=bool(kv_u("has_vocoder", 0)),
        mel_postnet_layers=kv_u("mel_postnet_layers", 0),
        mel_postnet_kernel_size=kv_u("mel_postnet_kernel_size", 0),
        global_encoder_input_channels=kv_u("global_encoder.input_channels", d.global_encoder_input_channels),
        global_encoder_output_channels=kv_u("global_encoder.output_channels", d.global_encoder_output_channels),
        global_encoder_dim=kv_u("global_encoder.dim", d.global_encoder_dim),
        global_encoder_intermediate_dim=kv_u("global_encoder.intermediate_dim", d.global_encoder_intermediate_dim),
        global_encoder_layers=kv_u("global_encoder.num_layers", d.global_encoder_layers),
        wave_upsampler_factors=ups_factors,
        wave_upsampler_kernel_sizes=ups_kernels,
        vocab_size=int(r.tensors["token_embd"].shape[0]),
        vocoder_upsample_rates=voc_rates,
        vocoder_num_kernels=voc_num_kernels,
    )

    def get(name):
        return r.tensor(name, dtype=dtype) if r.has_tensor(name) else None

    w: dict[str, Any] = {}
    w["token_embd"] = get("token_embd")
    w["prenet_blocks"] = _stack_blocks(get, cfg.prenet_layers, _spec_with_prefix(_TRANSFORMER_SPEC, "wave_prenet"))
    w["prenet_norm_w"] = get("wave_prenet.norm.weight")
    w["prenet_norm_b"] = get("wave_prenet.norm.bias")
    w["prenet_out_w"] = _t(get("wave_prenet.output.weight"))
    w["prenet_out_b"] = get("wave_prenet.output.bias")
    w["upsample_w"] = get("wave_upsample.weight")  # torch ConvTranspose1d [in, out, k]
    w["upsample_b"] = get("wave_upsample.bias")

    if cfg.model_type == 0:
        w["prior"] = _stack_blocks(get, cfg.resnet_blocks, _spec_with_prefix(_RESNET_SPEC, "wave_prior"))
        w["post"] = _stack_blocks(get, cfg.resnet_blocks, _spec_with_prefix(_RESNET_SPEC, "wave_post"))

    dec_spec = dict(_spec_with_prefix(_TRANSFORMER_SPEC, "wave_decoder"))
    dec_spec.update(_spec_with_prefix(_COND_SPEC, "wave_decoder"))
    optional = frozenset({"attn_norm_w", "attn_norm_b", "ffn_norm_w", "ffn_norm_b"}
                         if cfg.dynamic_global else
                         {"attn_cond_w", "attn_cond_b", "ffn_cond_w", "ffn_cond_b"})
    w["decoder_blocks"] = _stack_blocks(get, cfg.decoder_layers, dec_spec, optional=optional)

    if cfg.dynamic_global:
        w["norm_cond_w"] = _t(get("wave_decoder.norm_cond.weight"))
        w["norm_cond_b"] = get("wave_decoder.norm_cond.bias")
    else:
        w["decoder_norm_w"] = get("wave_decoder.norm.weight")
        w["decoder_norm_b"] = get("wave_decoder.norm.bias")

    w["istft_out_w"] = _t(get("istft_head.out.weight"))
    w["istft_out_b"] = get("istft_head.out.bias")
    if cfg.model_type == 0:
        # DFT matrices as weight leaves, not tracer constants: baked in,
        # they add ~15 MB (n_fft=1920) to EVERY codec executable — which a
        # warm restart re-ships through the relay per bucket/variant
        from ..ops.istft import _dft_tables

        w["istft_tables"] = tuple(np.asarray(t)
                                  for t in _dft_tables(cfg.n_fft))

    if cfg.wave_upsampler_factors:
        stages = []
        for i in range(len(cfg.wave_upsampler_factors)):
            stages.append({
                "up_w": get(f"wave_upsampler.up.{i}.weight"),  # [in, out, k]
                "up_b": get(f"wave_upsampler.up.{i}.bias"),
                "snake_alpha": get(f"wave_upsampler.snake.{i}.alpha"),
                "snake_beta": get(f"wave_upsampler.snake.{i}.beta"),
                "resblk": {k: get(pat.format(i=i)) for k, (pat, _) in
                           _spec_with_prefix(_RESNET_SPEC, "wave_upsampler.resblk").items()},
            })
        w["wave_upsampler"] = stages
        w["ups_out_proj_w"] = _t(get("wave_upsampler.out_proj.weight"))
        w["ups_out_proj_b"] = get("wave_upsampler.out_proj.bias")
        w["ups_out_snake_alpha"] = get("wave_upsampler.out_snake.alpha")
        w["ups_out_snake_beta"] = get("wave_upsampler.out_snake.beta")

    if cfg.model_type == 1 and cfg.mel_postnet_layers > 0:
        w["mel_postnet"] = _stack_blocks(get, cfg.mel_postnet_layers, {
            "conv_w": ("mel_postnet.{i}.conv.weight", False),
            "conv_b": ("mel_postnet.{i}.conv.bias", False),
            "norm_w": ("mel_postnet.{i}.norm.weight", False),
            "norm_b": ("mel_postnet.{i}.norm.bias", False),
        })

    if cfg.has_vocoder:
        from .vocoder import load_vocoder_weights

        w["vocoder"] = load_vocoder_weights(get, cfg)

    # optional global encoder (miocodec-decoder.cpp:713-744)
    if r.has_tensor("global_encoder.backbone.embed.weight"):
        ge: dict[str, Any] = {
            "embed_w": get("global_encoder.backbone.embed.weight"),  # conv [dim, in, k]
            "embed_b": get("global_encoder.backbone.embed.bias"),
            "norm_w": get("global_encoder.backbone.norm.weight"),
            "norm_b": get("global_encoder.backbone.norm.bias"),
            "final_norm_w": get("global_encoder.backbone.final_norm.weight"),
            "final_norm_b": get("global_encoder.backbone.final_norm.bias"),
            "blocks": _stack_blocks(get, cfg.global_encoder_layers, {
                "dwconv_w": ("global_encoder.backbone.blk.{i}.dwconv.weight", False),
                "dwconv_b": ("global_encoder.backbone.blk.{i}.dwconv.bias", False),
                "norm_w": ("global_encoder.backbone.blk.{i}.norm.weight", False),
                "norm_b": ("global_encoder.backbone.blk.{i}.norm.bias", False),
                "pw1_w": ("global_encoder.backbone.blk.{i}.pw1.weight", True),
                "pw1_b": ("global_encoder.backbone.blk.{i}.pw1.bias", False),
                "pw2_w": ("global_encoder.backbone.blk.{i}.pw2.weight", True),
                "pw2_b": ("global_encoder.backbone.blk.{i}.pw2.bias", False),
                "gamma": ("global_encoder.backbone.blk.{i}.gamma", False),
            }),
            "pool_attn0_w": get("global_encoder.pool.attn0.weight"),  # conv k=1
            "pool_attn0_b": get("global_encoder.pool.attn0.bias"),
            "pool_attn2_w": get("global_encoder.pool.attn2.weight"),
            "pool_attn2_b": get("global_encoder.pool.attn2.bias"),
            "pool_proj_w": _t(get("global_encoder.pool.proj.weight")),
            "pool_proj_b": get("global_encoder.pool.proj.bias"),
            "pool_norm_w": get("global_encoder.pool.norm.weight"),
            "pool_norm_b": get("global_encoder.pool.norm.bias"),
        }
        w["global_encoder"] = ge

    r.close()
    return cfg, w


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _transformer_stack(
    x: jnp.ndarray,
    blocks: Pytree,
    n_heads: int,
    lengths: jnp.ndarray,
    window: int,
    rope_theta: float,
    norm_eps: float,
    cond_act: jnp.ndarray | None,
    attn_impl: str | None = None,
) -> jnp.ndarray:
    """Scan over stacked transformer blocks. x: [B, T, C]; cond_act: [B, Dc]
    (SiLU-activated speaker embedding) enables AdaLN-Zero conditioning
    (miocodec-decoder.cpp:1190-1291)."""
    B, T, C = x.shape
    positions = jnp.arange(T, dtype=jnp.int32)
    dim = C

    def block(x, blk):
        if cond_act is not None:
            p = cond_act @ blk["attn_cond_w"] + blk["attn_cond_b"]  # [B, 3C]
            shift, scale, gate = p[:, :dim], p[:, dim:2 * dim], p[:, 2 * dim:]
            xn = adaln_modulate(layer_norm(x, eps=norm_eps), shift, scale)
        else:
            gate = None
            xn = layer_norm(x, blk["attn_norm_w"], blk["attn_norm_b"], eps=norm_eps)
        q = (xn @ blk["wq"]).reshape(B, T, n_heads, dim // n_heads)
        k = (xn @ blk["wk"]).reshape(B, T, n_heads, dim // n_heads)
        v = (xn @ blk["wv"]).reshape(B, T, n_heads, dim // n_heads)
        q = apply_rope(q, positions, rope_theta)
        k = apply_rope(k, positions, rope_theta)
        att = banded_attention(q, k, v, lengths, window,
                               impl=attn_impl).reshape(B, T, dim)
        out = att @ blk["wo"]
        if gate is not None:
            out = out * gate[:, None, :]
        h = x + out

        if cond_act is not None:
            p = cond_act @ blk["ffn_cond_w"] + blk["ffn_cond_b"]
            shift, scale, fgate = p[:, :dim], p[:, dim:2 * dim], p[:, 2 * dim:]
            fn = adaln_modulate(layer_norm(h, eps=norm_eps), shift, scale)
        else:
            fgate = None
            fn = layer_norm(h, blk["ffn_norm_w"], blk["ffn_norm_b"], eps=norm_eps)
        ff = (jax.nn.silu(fn @ blk["w1"]) * (fn @ blk["w3"])) @ blk["w2"]
        if fgate is not None:
            ff = ff * fgate[:, None, :]
        return h + ff, None

    y, _ = jax.lax.scan(lambda carry, blk: block(carry, blk), x, blocks)
    return y


def _resnet_block(x: jnp.ndarray, blk: Pytree, lengths: jnp.ndarray,
                  groups: int, gn_eps: float) -> jnp.ndarray:
    """GroupNorm/SiLU/conv residual block (miocodec-decoder.cpp:1293-1330).
    x: [B, T, C]; all biases are re-masked to keep the padding invariant."""
    C = x.shape[-1]
    g = choose_num_groups(groups, C)

    def half(y, nw, nb, cw, cb):
        y = masked_group_norm(y, lengths, g, eps=gn_eps)
        y = y * nw + nb
        y = jax.nn.silu(y)
        y = mask_time(y, lengths)
        y = conv1d_same(y, cw, cb)
        return mask_time(y, lengths)

    y = half(x, blk["norm1_w"], blk["norm1_b"], blk["conv1_w"], blk["conv1_b"])
    y = half(y, blk["norm2_w"], blk["norm2_b"], blk["conv2_w"], blk["conv2_b"])
    return x + y


def _snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """SnakeBeta activation with logscale params (miocodec-decoder.cpp:1332-1343):
    x + sin^2(e^alpha * x) / (e^beta + 1e-9). Preserves zeros."""
    a = jnp.exp(alpha.astype(jnp.float32))
    b = jnp.exp(beta.astype(jnp.float32))
    s = jnp.sin(x.astype(jnp.float32) * a)
    return (x + (s * s) / (b + 1e-9)).astype(x.dtype)


def codec_decode_spec(
    cfg: MioCodecConfig,
    w: Pytree,
    tokens: jnp.ndarray,
    token_lengths: jnp.ndarray,
    cond: jnp.ndarray | None,
    interp_anchor_tokens: int | None = None,
    sp_mesh=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """tokens: [B, N] int32 codes (padded), token_lengths: [B], cond: [B, Dc]
    speaker embedding or None (static models).

    Returns (spec [B, F, bins], frame_lengths [B]) where bins = n_fft+2 (wave)
    or n_mels (mel). Mirrors decode_tokens (miocodec-decoder.cpp:1353-1465).

    ``interp_anchor_tokens`` (static) pins the bilinear-resize ratio to a
    fixed token count so streaming prefix re-decodes are time-axis consistent
    (None = exact reference semantics: ratio from true lengths).

    ``sp_mesh`` (static; a Mesh with an "sp" axis) enables sequence
    parallelism: every time-major activation is constrained to shard its T
    axis over "sp" and GSPMD inserts the halo exchanges (convs), collective
    reductions (masked GroupNorm statistics) and gathers (bilinear resize)
    — the single-utterance latency lever on a multi-chip host, where dp
    fan-out leaves all but one device idle at B=1. Attention pins the
    blocked halo-gather path (a pallas_call cannot be auto-partitioned).

    Matmuls run at float32 precision by default: the reference accumulates
    attention in f32 (GGML_PREC_F32, miocodec-decoder.cpp:1252) and the
    fidelity target is mel-L1 < 1e-2, which TPU default-bf16 matmuls would
    not meet. MIOTTS_CODEC_MATMUL=bfloat16|tensorfloat32|float32 overrides
    (bf16 is ~2x matmul throughput; measure fidelity with
    MIOTTS_BENCH_MODE=fidelity before shipping it)."""
    with jax.default_matmul_precision(_codec_matmul_precision()):
        return _codec_decode_spec_impl(cfg, w, tokens, token_lengths, cond,
                                       interp_anchor_tokens, sp_mesh)


def _codec_matmul_precision() -> str:
    import os

    return os.environ.get("MIOTTS_CODEC_MATMUL", "float32")


def _codec_decode_spec_impl(cfg, w, tokens, token_lengths, cond,
                            interp_anchor_tokens=None, sp_mesh=None):
    B, N = tokens.shape
    spt, hop = cfg.samples_per_token, cfg.hop_length
    tf = cfg.wave_upsampler_total_factor

    attn_impl = None
    if sp_mesh is not None:
        attn_impl = "blocked"

    def _sp(x):
        """Re-pin the time axis (axis 1) to the "sp" mesh axis. GSPMD
        propagates shardings through most ops, but re-constraining after
        each resampling stage keeps the partitioner from drifting into
        replicated layouts across the gather-heavy seams."""
        if sp_mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "sp") if x.ndim == 2 else P(None, "sp", None)
        return jax.lax.with_sharding_constraint(x, NamedSharding(sp_mesh, spec))

    stft_len = jnp.maximum(1, (token_lengths * spt) // hop)
    dec_len = jnp.maximum(1, stft_len // tf) if tf > 1 else stft_len
    F_dec = cfg.decoder_frames(N)

    cond_act = None
    if cfg.dynamic_global:
        c = cond if cond is not None else jnp.zeros((B, cfg.decoder_adanorm_dim), jnp.float32)
        cond_act = jax.nn.silu(c.astype(jnp.float32))

    # prenet over tokens
    x = w["token_embd"][_sp(tokens)]  # [B, N, prenet_dim]
    x = _sp(mask_time(x, token_lengths))
    x = _transformer_stack(x, w["prenet_blocks"], cfg.prenet_heads, token_lengths,
                           cfg.prenet_window, cfg.rope_theta, cfg.norm_eps, None,
                           attn_impl=attn_impl)
    x = layer_norm(x, w["prenet_norm_w"], w["prenet_norm_b"], eps=cfg.norm_eps)
    x = x @ w["prenet_out_w"] + w["prenet_out_b"]  # [B, N, decoder_dim]
    x = mask_time(x, token_lengths)

    # conv-transpose x2 + per-example bilinear resize to decoder frames
    K_up = w["upsample_w"].shape[-1]
    y = conv_transpose1d(x, w["upsample_w"], w["upsample_b"], stride=2)
    src_len = (token_lengths - 1) * 2 + K_up
    y = mask_time(y, src_len)
    scale_override = None
    if interp_anchor_tokens is not None:
        a = interp_anchor_tokens
        scale_override = ((a - 1) * 2 + K_up, cfg.decoder_frames(a))
    y = linear_interpolate(y, src_len, dec_len, F_dec, scale_override=scale_override)
    y = _sp(mask_time(y, dec_len))

    if cfg.model_type == 0:
        for i in range(cfg.resnet_blocks):
            blk = jax.tree.map(lambda a: a[i], w["prior"])
            y = _resnet_block(y, blk, dec_len, cfg.resnet_groups, cfg.group_norm_eps)

    # conditioned decoder transformer
    x = _transformer_stack(y, w["decoder_blocks"], cfg.decoder_heads, dec_len,
                           cfg.decoder_window, cfg.rope_theta, cfg.norm_eps, cond_act,
                           attn_impl=attn_impl)
    if cfg.dynamic_global:
        dim = cfg.decoder_dim
        p = cond_act @ w["norm_cond_w"] + w["norm_cond_b"]  # [B, 2*dim]
        x = adaln_modulate(layer_norm(x, eps=cfg.norm_eps), p[:, :dim], p[:, dim:])
    else:
        x = layer_norm(x, w["decoder_norm_w"], w["decoder_norm_b"], eps=cfg.norm_eps)

    frame_len = dec_len
    if cfg.model_type == 0:
        for i in range(cfg.resnet_blocks):
            blk = jax.tree.map(lambda a: a[i], w["post"])
            x = _resnet_block(mask_time(x, frame_len), blk, frame_len,
                              cfg.resnet_groups, cfg.group_norm_eps)

        if cfg.wave_upsampler_factors:
            for i, stage in enumerate(w["wave_upsampler"]):
                f = cfg.wave_upsampler_factors[i]
                k = cfg.wave_upsampler_kernel_sizes[i]
                pad = max(0, (k - f) // 2)
                x = mask_time(x, frame_len)
                x = conv_transpose1d(x, stage["up_w"], stage["up_b"], stride=f)
                if pad > 0:
                    x = x[:, pad:x.shape[1] - pad, :]
                frame_len = (frame_len - 1) * f + k - 2 * pad
                x = _sp(mask_time(x, frame_len))
                x = _snake_beta(x, stage["snake_alpha"], stage["snake_beta"])
                x = _resnet_block(x, stage["resblk"], frame_len,
                                  cfg.resnet_groups, cfg.group_norm_eps)
            x = x @ w["ups_out_proj_w"] + w["ups_out_proj_b"]
            x = _snake_beta(x, w["ups_out_snake_alpha"], w["ups_out_snake_beta"])
            x = mask_time(x, frame_len)

    spec = x @ w["istft_out_w"] + w["istft_out_b"]
    spec = _sp(mask_time(spec, frame_len))
    return spec, frame_len


def codec_synthesize(
    cfg: MioCodecConfig,
    w: Pytree,
    tokens: jnp.ndarray,
    token_lengths: jnp.ndarray,
    cond: jnp.ndarray | None,
    interp_anchor_tokens: int | None = None,
    peak_normalize: bool = True,
    sp_mesh=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full codes -> waveform. Returns (audio [B, S_max], n_samples [B]);
    audio is peak-normalized per example like mio_tts_synthesize
    (mio-tts-lib.cpp:1299-1310) unless ``peak_normalize`` is False
    (streaming prefix decodes must keep a consistent gain). Wave mode goes
    through the iSTFT head; mel mode through the bundled BigVGAN-style
    vocoder (mio-tts-lib.cpp:1277-1286). ``sp_mesh`` shards the time axis
    over the mesh's "sp" axis (see codec_decode_spec)."""
    spec, frame_len = codec_decode_spec(cfg, w, tokens, token_lengths, cond,
                                        interp_anchor_tokens, sp_mesh=sp_mesh)
    with jax.default_matmul_precision(_codec_matmul_precision()):
        if cfg.model_type == 0:
            audio = spec_to_audio(spec, frame_len, cfg.n_fft, cfg.hop_length,
                                  tables=w.get("istft_tables"))
            n_pad = (cfg.n_fft - cfg.hop_length) // 2
            n_samples = (frame_len - 1) * cfg.hop_length + cfg.n_fft - 2 * n_pad
        else:
            if not cfg.has_vocoder:
                raise NotImplementedError("mel-mode model has no bundled MioVocoder tensors")
            from .vocoder import vocoder_decode

            # pallas_call is opaque to the GSPMD partitioner — pin the
            # vocoder's conv1d/activation1d dispatch to XLA under sp, the
            # same constraint that pins attention to "blocked" above
            audio, n_samples = vocoder_decode(
                cfg, w, spec, frame_len,
                impl="xla" if sp_mesh is not None else None)
    valid = time_mask(audio.shape[1], n_samples)
    audio = audio * valid.astype(audio.dtype)
    if peak_normalize:
        peak = jnp.max(jnp.abs(jnp.where(jnp.isfinite(audio), audio, 0.0)), axis=1)
        gain = jnp.where(peak > 0.98, 0.95 / jnp.maximum(peak, 1e-9), 1.0)
        audio = audio * gain[:, None]
    return audio, n_samples


# ---------------------------------------------------------------------------
# Global (speaker) encoder: SSL features -> 128-d embedding
# ---------------------------------------------------------------------------

def encode_global_embedding(
    cfg: MioCodecConfig,
    w: Pytree,
    ssl: jnp.ndarray,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """ConvNeXt backbone + attentive-stats pooling
    (miocodec-decoder.cpp:824-941). ssl: [B, T, 768]; returns [B, 128]."""
    with jax.default_matmul_precision("float32"):
        return _encode_global_embedding_impl(cfg, w, ssl, lengths)


def _encode_global_embedding_impl(cfg, w, ssl, lengths):
    ge = w["global_encoder"]
    x = mask_time(ssl, lengths)
    x = conv1d_same(x, ge["embed_w"], ge["embed_b"])  # k from weight, pad k//2
    x = mask_time(x, lengths)
    x = layer_norm(x, ge["norm_w"], ge["norm_b"], eps=1e-6)

    n_blocks = ge["blocks"]["dwconv_w"].shape[0]
    for i in range(n_blocks):
        blk = jax.tree.map(lambda a: a[i], ge["blocks"])
        res = x
        y = mask_time(x, lengths)
        y = conv1d_depthwise_same(y, blk["dwconv_w"], blk["dwconv_b"])
        y = mask_time(y, lengths)
        y = layer_norm(y, blk["norm_w"], blk["norm_b"], eps=1e-6)
        y = jax.nn.gelu(y @ blk["pw1_w"] + blk["pw1_b"], approximate=True)  # ggml_gelu = tanh approx
        y = y @ blk["pw2_w"] + blk["pw2_b"]
        y = y * blk["gamma"]
        x = res + y

    x = layer_norm(x, ge["final_norm_w"], ge["final_norm_b"], eps=1e-6)
    x = mask_time(x, lengths)

    # attentive stats pooling: k=1 convs are pure linears
    a = jnp.einsum("btc,dc->btd", x, ge["pool_attn0_w"][:, :, 0]) + ge["pool_attn0_b"]
    a = jnp.tanh(a)
    a = jnp.einsum("btc,dc->btd", a, ge["pool_attn2_w"][:, :, 0]) + ge["pool_attn2_b"]
    valid = time_mask(x.shape[1], lengths)[:, :, None]
    a = jnp.where(valid, a.astype(jnp.float32), -jnp.inf)
    alpha = jax.nn.softmax(a, axis=1)  # softmax over time per channel
    xf = x.astype(jnp.float32)
    mean = jnp.sum(alpha * xf, axis=1)
    m2 = jnp.sum(alpha * xf * xf, axis=1)
    var = jnp.clip(m2 - mean * mean, 1e-4, 1e4)
    std = jnp.sqrt(var)
    stat = jnp.concatenate([mean, std], axis=-1)
    out = stat @ ge["pool_proj_w"] + ge["pool_proj_b"]
    out = layer_norm(out, ge["pool_norm_w"], ge["pool_norm_b"], eps=1e-5)
    # non-finite -> zero fallback (miocodec-decoder.cpp:1048-1061)
    bad = jnp.any(~jnp.isfinite(out), axis=-1, keepdims=True)
    return jnp.where(bad, 0.0, out)
