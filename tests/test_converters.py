"""Converter tests: synthetic torch checkpoints -> GGUF -> loaders -> forward.

Key parity check: a static-preset export (AdaLN folded at conversion time,
convert_miocodec_to_gguf.py:272-303) must produce the same spectrogram as the
dynamic export conditioned with the same embedding at runtime.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from miotts_tpu.convert.miocodec import convert_miocodec, decode_fsq_indices, weight_norm_fuse
from miotts_tpu.convert.wavlm import convert_wavlm
from miotts_tpu.models.miocodec import codec_decode_spec, load_miocodec
from miotts_tpu.models.wavlm import WavLMExtractor, load_wavlm


def _make_codec_checkpoint(tmp_path, rng, with_upsampler=False):
    """Synthetic MioCodec training checkpoint (safetensors + config.yaml)
    with small dims but real FSQ levels product = 12800."""
    levels = [8, 5, 5, 8, 8]  # prod = 12800
    pd, dd, ada = 16, 8, 12
    p_layers, d_layers, heads = 1, 1, 2
    ge_in, ge_dim, ge_ff, ge_out, ge_layers = 24, 20, 40, ada, 1
    n_fft, hop, sr = 64, 16, 24000
    n_res = 1

    def t(*shape, scale=0.1):
        return torch.tensor(rng.randn(*shape) * scale, dtype=torch.float32)

    sd = {}
    sd["local_quantizer.proj_out.weight"] = t(pd, len(levels))
    sd["local_quantizer.proj_out.bias"] = t(pd)

    def transformer(prefix, n, dim, ff, cond=False):
        for i in range(n):
            s = f"{prefix}.layers.{i}"
            if cond:
                sd[f"{s}.attention_norm.condition_proj.1.weight"] = t(3 * dim, ada)
                sd[f"{s}.attention_norm.condition_proj.1.bias"] = t(3 * dim)
                sd[f"{s}.ffn_norm.condition_proj.1.weight"] = t(3 * dim, ada)
                sd[f"{s}.ffn_norm.condition_proj.1.bias"] = t(3 * dim)
            else:
                sd[f"{s}.attention_norm.weight"] = 1.0 + t(dim, scale=0.02)
                sd[f"{s}.attention_norm.bias"] = t(dim, scale=0.02)
                sd[f"{s}.ffn_norm.weight"] = 1.0 + t(dim, scale=0.02)
                sd[f"{s}.ffn_norm.bias"] = t(dim, scale=0.02)
            for nm in ("wq", "wk", "wv", "wo"):
                sd[f"{s}.attention.{nm}.weight"] = t(dim, dim, scale=0.3)
            sd[f"{s}.feed_forward.w1.weight"] = t(ff, dim, scale=0.3)
            sd[f"{s}.feed_forward.w2.weight"] = t(dim, ff, scale=0.3)
            sd[f"{s}.feed_forward.w3.weight"] = t(ff, dim, scale=0.3)

    transformer("wave_prenet", p_layers, pd, 24)
    sd["wave_prenet.norm.weight"] = 1.0 + t(pd, scale=0.02)
    sd["wave_prenet.norm.bias"] = t(pd, scale=0.02)
    sd["wave_prenet.output_proj.weight"] = t(dd, pd, scale=0.3)
    sd["wave_prenet.output_proj.bias"] = t(dd, scale=0.02)
    sd["wave_conv_upsample.weight"] = t(dd, dd, 4, scale=0.3)
    sd["wave_conv_upsample.bias"] = t(dd, scale=0.02)

    def resnet(prefix, n, ch):
        for i in range(n):
            s = f"{prefix}.blocks.{i}"
            sd[f"{s}.norm1.weight"] = 1.0 + t(ch, scale=0.02)
            sd[f"{s}.norm1.bias"] = t(ch, scale=0.02)
            sd[f"{s}.conv1.weight"] = t(ch, ch, 3, scale=0.3)
            sd[f"{s}.conv1.bias"] = t(ch, scale=0.02)
            sd[f"{s}.norm2.weight"] = 1.0 + t(ch, scale=0.02)
            sd[f"{s}.norm2.bias"] = t(ch, scale=0.02)
            sd[f"{s}.conv2.weight"] = t(ch, ch, 3, scale=0.3)
            sd[f"{s}.conv2.bias"] = t(ch, scale=0.02)

    resnet("wave_prior_net", n_res, dd)
    resnet("wave_post_net", n_res, dd)
    transformer("wave_decoder", d_layers, dd, 16, cond=True)
    sd["wave_decoder.norm.condition_proj.1.weight"] = t(2 * dd, ada)
    sd["wave_decoder.norm.condition_proj.1.bias"] = t(2 * dd)
    sd["istft_head.out.weight"] = t(n_fft + 2, dd, scale=0.05)
    sd["istft_head.out.bias"] = t(n_fft + 2, scale=0.02)

    ups_factors = []
    if with_upsampler:
        ups_factors = [2]
        v = t(dd, dd, 4, scale=0.3)
        g = 1.0 + t(dd, scale=0.1)
        sd["wave_upsampler.upsample_layers.0.parametrizations.weight.original0"] = g
        sd["wave_upsampler.upsample_layers.0.parametrizations.weight.original1"] = v
        sd["wave_upsampler.upsample_layers.0.bias"] = t(dd, scale=0.02)
        sd["wave_upsampler.snake_activations.0.alpha"] = t(dd, scale=0.1)
        sd["wave_upsampler.snake_activations.0.beta"] = t(dd, scale=0.1)
        resnet_prefix = "wave_upsampler.resnet_blocks"
        s = f"{resnet_prefix}.0"
        for nm, shape in [("norm1.weight", (dd,)), ("norm1.bias", (dd,)),
                          ("conv1.weight", (dd, dd, 3)), ("conv1.bias", (dd,)),
                          ("norm2.weight", (dd,)), ("norm2.bias", (dd,)),
                          ("conv2.weight", (dd, dd, 3)), ("conv2.bias", (dd,))]:
            base = 1.0 if nm.endswith("norm1.weight") or nm.endswith("norm2.weight") else 0.0
            sd[f"{s}.{nm}"] = base + t(*shape, scale=0.1)
        sd["wave_upsampler.out_proj.weight"] = t(dd, dd, scale=0.3)
        sd["wave_upsampler.out_proj.bias"] = t(dd, scale=0.02)
        sd["wave_upsampler.out_snake.alpha"] = t(dd, scale=0.1)
        sd["wave_upsampler.out_snake.beta"] = t(dd, scale=0.1)

    # global encoder
    sd["global_encoder.backbone.embed.weight"] = t(ge_dim, ge_in, 7, scale=0.2)
    sd["global_encoder.backbone.embed.bias"] = t(ge_dim, scale=0.02)
    sd["global_encoder.backbone.norm.weight"] = 1.0 + t(ge_dim, scale=0.02)
    sd["global_encoder.backbone.norm.bias"] = t(ge_dim, scale=0.02)
    sd["global_encoder.backbone.final_layer_norm.weight"] = 1.0 + t(ge_dim, scale=0.02)
    sd["global_encoder.backbone.final_layer_norm.bias"] = t(ge_dim, scale=0.02)
    for i in range(ge_layers):
        s = f"global_encoder.backbone.convnext.{i}"
        sd[f"{s}.dwconv.weight"] = t(ge_dim, 1, 7, scale=0.2)
        sd[f"{s}.dwconv.bias"] = t(ge_dim, scale=0.02)
        sd[f"{s}.norm.weight"] = 1.0 + t(ge_dim, scale=0.02)
        sd[f"{s}.norm.bias"] = t(ge_dim, scale=0.02)
        sd[f"{s}.pwconv1.weight"] = t(ge_ff, ge_dim, scale=0.2)
        sd[f"{s}.pwconv1.bias"] = t(ge_ff, scale=0.02)
        sd[f"{s}.pwconv2.weight"] = t(ge_dim, ge_ff, scale=0.2)
        sd[f"{s}.pwconv2.bias"] = t(ge_dim, scale=0.02)
        sd[f"{s}.gamma"] = t(ge_dim, scale=0.3)
    sd["global_encoder.pooling.attn.0.weight"] = t(ge_dim, ge_dim, 1, scale=0.2)
    sd["global_encoder.pooling.attn.0.bias"] = t(ge_dim, scale=0.02)
    sd["global_encoder.pooling.attn.2.weight"] = t(ge_dim, ge_dim, 1, scale=0.2)
    sd["global_encoder.pooling.attn.2.bias"] = t(ge_dim, scale=0.02)
    sd["global_encoder.pooling.proj.weight"] = t(ge_out, 2 * ge_dim, scale=0.2)
    sd["global_encoder.pooling.proj.bias"] = t(ge_out, scale=0.02)
    sd["global_encoder.pooling.norm.weight"] = 1.0 + t(ge_out, scale=0.02)
    sd["global_encoder.pooling.norm.bias"] = t(ge_out, scale=0.02)

    from safetensors.torch import save_file

    weights_path = tmp_path / "model.safetensors"
    save_file(sd, str(weights_path))

    config = {
        "model": {"init_args": {
            "config": {
                "use_wave_decoder": True, "n_fft": n_fft, "hop_length": hop,
                "sample_rate": sr, "wave_resnet_num_blocks": n_res,
                "wave_resnet_num_groups": 4,
                "wave_upsampler_factors": ups_factors,
            },
            "wave_prenet": {"init_args": {
                "n_layers": p_layers, "dim": pd, "n_heads": heads,
                "window_size": 9}},
            "wave_decoder": {"init_args": {
                "n_layers": d_layers, "dim": dd, "n_heads": heads,
                "window_size": 9, "adanorm_condition_dim": ada,
                "rope_theta": 10000.0, "norm_eps": 1e-5}},
            "local_quantizer": {"init_args": {"levels": levels}},
            "global_encoder": {"init_args": {
                "input_channels": ge_in, "output_channels": ge_out,
                "dim": ge_dim, "intermediate_dim": ge_ff,
                "num_layers": ge_layers}},
        }},
    }
    import yaml

    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.safe_dump(config))
    return str(config_path), str(weights_path)


def test_fsq_decode_basic():
    levels = [8, 5, 5, 8, 8]
    codes = decode_fsq_indices(np.arange(12800, dtype=np.int64), levels)
    assert codes.shape == (12800, 5)
    assert codes.min() >= -1.0 and codes.max() <= 1.0
    # index 0 decodes to all -1 (digit 0 in every level)
    np.testing.assert_allclose(codes[0], -1.0)
    # unique rows
    assert len(np.unique(codes.round(6), axis=0)) == 12800


def test_weight_norm_fuse_matches_torch():
    rng = np.random.RandomState(0)
    v = rng.randn(6, 4, 5).astype(np.float32)
    g = rng.rand(6).astype(np.float32) + 0.5
    got = weight_norm_fuse(g, v, dim=0)
    vt = torch.tensor(v)
    norm = torch.linalg.vector_norm(vt.reshape(6, -1), dim=1, keepdim=True).clamp_min(1e-12)
    expect = (vt * (torch.tensor(g).unsqueeze(-1) / norm).unsqueeze(-1)).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_convert_dynamic_and_static_agree(tmp_path):
    rng = np.random.RandomState(0)
    cfg_path, weights_path = _make_codec_checkpoint(tmp_path, rng)

    dyn_path = tmp_path / "dyn.gguf"
    convert_miocodec(cfg_path, weights_path, str(dyn_path), dynamic_global=True)

    emb = (rng.randn(12) * 0.5).astype(np.float32)
    np.save(tmp_path / "emb.npy", emb)
    np.savez(tmp_path / "emb.npz", global_embedding=emb)
    static_path = tmp_path / "static.gguf"
    convert_miocodec(cfg_path, weights_path, str(static_path), dynamic_global=False,
                     preset_embedding=str(tmp_path / "emb.npz"))

    dcfg, dw = load_miocodec(str(dyn_path))
    scfg, sw = load_miocodec(str(static_path))
    assert dcfg.dynamic_global and not scfg.dynamic_global
    assert dcfg.vocab_size == 12800

    codes = rng.randint(0, 12800, 7).astype(np.int32)
    tokens = jnp.asarray(codes)[None]
    lengths = jnp.asarray([7], jnp.int32)
    dw = jax.tree.map(jnp.asarray, dw)
    sw = jax.tree.map(jnp.asarray, sw)
    spec_d, fl_d = jax.jit(codec_decode_spec, static_argnums=0)(
        dcfg, dw, tokens, lengths, jnp.asarray(emb)[None])
    spec_s, fl_s = jax.jit(codec_decode_spec, static_argnums=0)(
        scfg, sw, tokens, lengths, None)
    f = int(fl_d[0])
    assert int(fl_s[0]) == f
    np.testing.assert_allclose(np.array(spec_d[0, :f]), np.array(spec_s[0, :f]),
                               rtol=1e-3, atol=1e-4)


def test_convert_with_upsampler(tmp_path):
    rng = np.random.RandomState(1)
    cfg_path, weights_path = _make_codec_checkpoint(tmp_path, rng, with_upsampler=True)
    out = tmp_path / "ups.gguf"
    summary = convert_miocodec(cfg_path, weights_path, str(out), dynamic_global=True,
                               samples_per_token=32)
    assert summary["has_wave_upsampler"]
    cfg, w = load_miocodec(str(out))
    assert cfg.wave_upsampler_factors == (2,)
    w = jax.tree.map(jnp.asarray, w)
    codes = rng.randint(0, 12800, 6).astype(np.int32)
    spec, fl = jax.jit(codec_decode_spec, static_argnums=0)(
        cfg, w, jnp.asarray(codes)[None], jnp.asarray([6], jnp.int32),
        jnp.zeros((1, cfg.decoder_adanorm_dim)))
    assert np.isfinite(np.array(spec)).all()


def test_convert_wavlm_checkpoint(tmp_path):
    rng = np.random.RandomState(2)

    def t(*shape, scale=0.1):
        return torch.tensor(rng.randn(*shape) * scale, dtype=torch.float32)

    sd = {}
    sd["feature_extractor.conv_layers.0.layer_norm.weight"] = 1.0 + t(512, scale=0.02)
    sd["feature_extractor.conv_layers.0.layer_norm.bias"] = t(512, scale=0.02)
    sd["feature_extractor.conv_layers.0.conv.weight"] = t(512, 1, 10, scale=0.2)
    for i, k in enumerate([3, 3, 3, 3, 2, 2], start=1):
        sd[f"feature_extractor.conv_layers.{i}.conv.weight"] = t(512, 512, k, scale=0.05)
    sd["encoder.feature_projection.layer_norm.weight"] = 1.0 + t(512, scale=0.02)
    sd["encoder.feature_projection.layer_norm.bias"] = t(512, scale=0.02)
    sd["encoder.feature_projection.projection.weight"] = t(768, 512, scale=0.05)
    sd["encoder.feature_projection.projection.bias"] = t(768, scale=0.02)
    sd["encoder.transformer.layer_norm.weight"] = 1.0 + t(768, scale=0.02)
    sd["encoder.transformer.layer_norm.bias"] = t(768, scale=0.02)
    sd["encoder.transformer.pos_conv_embed.conv.weight_v"] = t(768, 48, 128, scale=0.05)
    sd["encoder.transformer.pos_conv_embed.conv.weight_g"] = 1.0 + t(1, 1, 128, scale=0.05)
    sd["encoder.transformer.pos_conv_embed.conv.bias"] = t(768, scale=0.02)
    for i in range(3):
        s = f"encoder.transformer.layers.{i}"
        sd[f"{s}.attention.attention.in_proj_weight"] = t(3 * 768, 768, scale=0.05)
        sd[f"{s}.attention.attention.in_proj_bias"] = t(3 * 768, scale=0.02)
        sd[f"{s}.attention.attention.out_proj.weight"] = t(768, 768, scale=0.05)
        sd[f"{s}.attention.attention.out_proj.bias"] = t(768, scale=0.02)
        sd[f"{s}.attention.gru_rel_pos_linear.weight"] = t(8, 64, scale=0.1)
        sd[f"{s}.attention.gru_rel_pos_linear.bias"] = t(8, scale=0.05)
        sd[f"{s}.attention.gru_rel_pos_const"] = t(1, 12, 1, 1, scale=0.3)
        sd[f"{s}.layer_norm.weight"] = 1.0 + t(768, scale=0.02)
        sd[f"{s}.layer_norm.bias"] = t(768, scale=0.02)
        sd[f"{s}.final_layer_norm.weight"] = 1.0 + t(768, scale=0.02)
        sd[f"{s}.final_layer_norm.bias"] = t(768, scale=0.02)
        sd[f"{s}.feed_forward.intermediate_dense.weight"] = t(3072, 768, scale=0.03)
        sd[f"{s}.feed_forward.intermediate_dense.bias"] = t(3072, scale=0.02)
        sd[f"{s}.feed_forward.output_dense.weight"] = t(768, 3072, scale=0.03)
        sd[f"{s}.feed_forward.output_dense.bias"] = t(768, scale=0.02)
    sd["encoder.transformer.layers.0.attention.rel_attn_embed.weight"] = t(320, 12, scale=0.2)

    ckpt = tmp_path / "wavlm_base_plus.pth"
    torch.save({"model": sd}, str(ckpt))

    out = tmp_path / "wavlm.gguf"
    summary = convert_wavlm(str(ckpt), str(out), num_transformer_layers=2)
    assert summary["n_layers"] == 2

    cfg, w = load_wavlm(str(out))
    assert cfg.n_layers == 2 and cfg.embed_dim == 768
    ext = WavLMExtractor(str(out))
    wav = (rng.randn(4000) * 0.2).astype(np.float32)
    ssl, n_frames = ext.extract_from_wav16k(wav)
    assert ssl.shape == (n_frames, 768)
    assert np.isfinite(ssl).all()
    assert n_frames == cfg.conv_out_len(4000)
