"""Independent numpy oracle for the MioCodec decode graph.

A second, loop-level implementation of the reference math
(miocodec-decoder.cpp:1079-1664 and mio-tts-lib.cpp:625-756), written
directly from the GGML op semantics — used to cross-check the JAX forward.
Single unpadded example, float64-free, plain numpy.
"""

from __future__ import annotations

import numpy as np


def layer_norm(x, w=None, b=None, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y


def silu(x):
    return x / (1.0 + np.exp(-x))


def rope(x, theta_base):
    # x: [T, H, D]; ggml mode-0: adjacent pairs, angle = pos * base^(-2i/D)
    T, H, D = x.shape
    out = x.copy()
    for t in range(T):
        for i in range(D // 2):
            ang = t * theta_base ** (-2.0 * i / D)
            c, s = np.cos(ang), np.sin(ang)
            x0 = x[t, :, 2 * i].copy()
            x1 = x[t, :, 2 * i + 1].copy()
            out[t, :, 2 * i] = x0 * c - x1 * s
            out[t, :, 2 * i + 1] = x0 * s + x1 * c
    return out


def attention(x, wq, wk, wv, wo, n_heads, window, theta_base):
    # x: [T, C]; weights [out, in] torch layout
    T, C = x.shape
    hd = C // n_heads
    q = (x @ wq.T).reshape(T, n_heads, hd)
    k = (x @ wk.T).reshape(T, n_heads, hd)
    v = (x @ wv.T).reshape(T, n_heads, hd)
    q = rope(q, theta_base)
    k = rope(k, theta_base)
    half = window // 2
    out = np.zeros((T, n_heads, hd), dtype=np.float32)
    scale = 1.0 / np.sqrt(hd)
    for h in range(n_heads):
        scores = q[:, h, :] @ k[:, h, :].T * scale  # [T, T]
        for qq in range(T):
            for kk in range(T):
                if abs(kk - qq) > half:
                    scores[qq, kk] = -np.inf
        m = scores.max(axis=-1, keepdims=True)
        p = np.exp(scores - m)
        p /= p.sum(axis=-1, keepdims=True)
        out[:, h, :] = p @ v[:, h, :]
    return out.reshape(T, C) @ wo.T


def transformer_block(x, blk, n_heads, window, theta_base, norm_eps, cond_act=None):
    dim = x.shape[-1]
    if cond_act is not None:
        p = blk["attn_cond_w"] @ cond_act + blk["attn_cond_b"]
        shift, scale, gate = p[:dim], p[dim:2 * dim], p[2 * dim:]
        xn = layer_norm(x, eps=norm_eps) * (1.0 + scale) + shift
    else:
        gate = None
        xn = layer_norm(x, blk["attn_norm_w"], blk["attn_norm_b"], eps=norm_eps)
    att = attention(xn, blk["wq"], blk["wk"], blk["wv"], blk["wo"],
                    n_heads, window, theta_base)
    if gate is not None:
        att = att * gate
    h = x + att
    if cond_act is not None:
        p = blk["ffn_cond_w"] @ cond_act + blk["ffn_cond_b"]
        shift, scale, fgate = p[:dim], p[dim:2 * dim], p[2 * dim:]
        fn = layer_norm(h, eps=norm_eps) * (1.0 + scale) + shift
    else:
        fgate = None
        fn = layer_norm(h, blk["ffn_norm_w"], blk["ffn_norm_b"], eps=norm_eps)
    ff = (silu(fn @ blk["w1"].T) * (fn @ blk["w3"].T)) @ blk["w2"].T
    if fgate is not None:
        ff = ff * fgate
    return h + ff


def conv1d_same(x, w, b):
    # x: [T, Cin], w: [Cout, Cin, K], pad K//2 zeros both sides
    T, Cin = x.shape
    Cout, _, K = w.shape
    pad = K // 2
    xp = np.zeros((T + 2 * pad, Cin), dtype=x.dtype)
    xp[pad:pad + T] = x
    out = np.zeros((T, Cout), dtype=np.float32)
    for t in range(T):
        seg = xp[t:t + K]  # [K, Cin]
        out[t] = np.einsum("kc,ock->o", seg, w) + b
    return out


def conv_transpose1d(x, w, b, stride):
    # x: [T, Cin], w: [Cin, Cout, K] (torch ConvTranspose1d)
    T, Cin = x.shape
    _, Cout, K = w.shape
    out_len = (T - 1) * stride + K
    out = np.zeros((out_len, Cout), dtype=np.float32)
    for t in range(T):
        for kk in range(K):
            out[t * stride + kk] += x[t] @ w[:, :, kk]
    return out + b


def group_norm(x, num_groups, eps):
    # x: [T, C], stats per group over (T x C_g)
    T, C = x.shape
    cg = C // num_groups
    y = np.empty_like(x)
    for g in range(num_groups):
        sl = slice(g * cg, (g + 1) * cg)
        seg = x[:, sl]
        m = seg.mean()
        v = ((seg - m) ** 2).mean()
        y[:, sl] = (seg - m) / np.sqrt(v + eps)
    return y


def choose_num_groups(groups, channels):
    g = max(1, min(groups, channels))
    while g > 1 and channels % g != 0:
        g -= 1
    return max(1, g)


def resnet_block(x, blk, groups, gn_eps):
    g = choose_num_groups(groups, x.shape[-1])
    y = group_norm(x, g, gn_eps) * blk["norm1_w"] + blk["norm1_b"]
    y = silu(y)
    y = conv1d_same(y, blk["conv1_w"], blk["conv1_b"])
    y = group_norm(y, g, gn_eps) * blk["norm2_w"] + blk["norm2_b"]
    y = silu(y)
    y = conv1d_same(y, blk["conv2_w"], blk["conv2_b"])
    return x + y


def bilinear_resize_1d(x, dst):
    # x: [T, C] -> [dst, C], half-pixel centers, clamped, dx from unclamped floor
    src = x.shape[0]
    out = np.zeros((dst, x.shape[1]), dtype=x.dtype)
    sf = dst / src
    for i in range(dst):
        pos = (i + 0.5) / sf - 0.5
        x0 = int(np.floor(pos))
        dx = pos - x0
        a = x[min(max(x0, 0), src - 1)]
        bb = x[min(max(x0 + 1, 0), src - 1)]
        out[i] = a * (1 - dx) + bb * dx
    return out


def snake_beta(x, alpha, beta):
    a = np.exp(alpha)
    b = np.exp(beta)
    return x + np.sin(x * a) ** 2 / (b + 1e-9)


def decode_spec(cfg, w, codes, cond):
    """cfg: dict of hyperparams; w: raw tensors keyed by GGUF names
    (torch-layout); codes: [N] int; cond: [Dc] or None."""
    spt, hop = cfg["samples_per_token"], cfg["hop_length"]
    n = len(codes)
    tf = 1
    for f in cfg.get("ups_factors", ()):
        tf *= f
    stft_frames = max(1, n * spt // hop)
    dec_frames = max(1, stft_frames // tf if tf > 1 else stft_frames)

    cond_act = silu(cond.astype(np.float32)) if cond is not None else None

    x = w["token_embd"][codes].astype(np.float32)
    for i in range(cfg["prenet_layers"]):
        blk = {
            "attn_norm_w": w[f"wave_prenet.blk.{i}.attn_norm.weight"],
            "attn_norm_b": w[f"wave_prenet.blk.{i}.attn_norm.bias"],
            "wq": w[f"wave_prenet.blk.{i}.attn_q.weight"],
            "wk": w[f"wave_prenet.blk.{i}.attn_k.weight"],
            "wv": w[f"wave_prenet.blk.{i}.attn_v.weight"],
            "wo": w[f"wave_prenet.blk.{i}.attn_output.weight"],
            "ffn_norm_w": w[f"wave_prenet.blk.{i}.ffn_norm.weight"],
            "ffn_norm_b": w[f"wave_prenet.blk.{i}.ffn_norm.bias"],
            "w1": w[f"wave_prenet.blk.{i}.ffn_gate.weight"],
            "w2": w[f"wave_prenet.blk.{i}.ffn_down.weight"],
            "w3": w[f"wave_prenet.blk.{i}.ffn_up.weight"],
        }
        x = transformer_block(x, blk, cfg["prenet_heads"], cfg["prenet_window"],
                              cfg["rope_theta"], cfg["norm_eps"])
    x = layer_norm(x, w["wave_prenet.norm.weight"], w["wave_prenet.norm.bias"], cfg["norm_eps"])
    x = x @ w["wave_prenet.output.weight"].T + w["wave_prenet.output.bias"]

    y = conv_transpose1d(x, w["wave_upsample.weight"], w["wave_upsample.bias"], 2)
    y = bilinear_resize_1d(y, dec_frames)

    for i in range(cfg["resnet_blocks"]):
        blk = {k: w[f"wave_prior.{i}.{nm}"] for k, nm in
               [("norm1_w", "norm1.weight"), ("norm1_b", "norm1.bias"),
                ("conv1_w", "conv1.weight"), ("conv1_b", "conv1.bias"),
                ("norm2_w", "norm2.weight"), ("norm2_b", "norm2.bias"),
                ("conv2_w", "conv2.weight"), ("conv2_b", "conv2.bias")]}
        y = resnet_block(y, blk, cfg["resnet_groups"], cfg["group_norm_eps"])

    x = y
    for i in range(cfg["decoder_layers"]):
        blk = {
            "wq": w[f"wave_decoder.blk.{i}.attn_q.weight"],
            "wk": w[f"wave_decoder.blk.{i}.attn_k.weight"],
            "wv": w[f"wave_decoder.blk.{i}.attn_v.weight"],
            "wo": w[f"wave_decoder.blk.{i}.attn_output.weight"],
            "w1": w[f"wave_decoder.blk.{i}.ffn_gate.weight"],
            "w2": w[f"wave_decoder.blk.{i}.ffn_down.weight"],
            "w3": w[f"wave_decoder.blk.{i}.ffn_up.weight"],
        }
        if cond_act is not None:
            blk["attn_cond_w"] = w[f"wave_decoder.blk.{i}.attn_cond.weight"]
            blk["attn_cond_b"] = w[f"wave_decoder.blk.{i}.attn_cond.bias"]
            blk["ffn_cond_w"] = w[f"wave_decoder.blk.{i}.ffn_cond.weight"]
            blk["ffn_cond_b"] = w[f"wave_decoder.blk.{i}.ffn_cond.bias"]
        else:
            blk["attn_norm_w"] = w[f"wave_decoder.blk.{i}.attn_norm.weight"]
            blk["attn_norm_b"] = w[f"wave_decoder.blk.{i}.attn_norm.bias"]
            blk["ffn_norm_w"] = w[f"wave_decoder.blk.{i}.ffn_norm.weight"]
            blk["ffn_norm_b"] = w[f"wave_decoder.blk.{i}.ffn_norm.bias"]
        x = transformer_block(x, blk, cfg["decoder_heads"], cfg["decoder_window"],
                              cfg["rope_theta"], cfg["norm_eps"], cond_act)

    dim = x.shape[-1]
    if cond_act is not None:
        p = w["wave_decoder.norm_cond.weight"] @ cond_act + w["wave_decoder.norm_cond.bias"]
        x = layer_norm(x, eps=cfg["norm_eps"]) * (1.0 + p[dim:]) + p[:dim]
    else:
        x = layer_norm(x, w["wave_decoder.norm.weight"], w["wave_decoder.norm.bias"],
                       cfg["norm_eps"])

    for i in range(cfg["resnet_blocks"]):
        blk = {k: w[f"wave_post.{i}.{nm}"] for k, nm in
               [("norm1_w", "norm1.weight"), ("norm1_b", "norm1.bias"),
                ("conv1_w", "conv1.weight"), ("conv1_b", "conv1.bias"),
                ("norm2_w", "norm2.weight"), ("norm2_b", "norm2.bias"),
                ("conv2_w", "conv2.weight"), ("conv2_b", "conv2.bias")]}
        x = resnet_block(x, blk, cfg["resnet_groups"], cfg["group_norm_eps"])

    for i, f in enumerate(cfg.get("ups_factors", ())):
        k = cfg["ups_kernels"][i]
        pad = max(0, (k - f) // 2)
        x = conv_transpose1d(x, w[f"wave_upsampler.up.{i}.weight"],
                             w[f"wave_upsampler.up.{i}.bias"], f)
        if pad > 0:
            x = x[pad:len(x) - pad]
        x = snake_beta(x, w[f"wave_upsampler.snake.{i}.alpha"],
                       w[f"wave_upsampler.snake.{i}.beta"])
        blk = {kk: w[f"wave_upsampler.resblk.{i}.{nm}"] for kk, nm in
               [("norm1_w", "norm1.weight"), ("norm1_b", "norm1.bias"),
                ("conv1_w", "conv1.weight"), ("conv1_b", "conv1.bias"),
                ("norm2_w", "norm2.weight"), ("norm2_b", "norm2.bias"),
                ("conv2_w", "conv2.weight"), ("conv2_b", "conv2.bias")]}
        x = resnet_block(x, blk, cfg["resnet_groups"], cfg["group_norm_eps"])
    if cfg.get("ups_factors"):
        x = x @ w["wave_upsampler.out_proj.weight"].T + w["wave_upsampler.out_proj.bias"]
        x = snake_beta(x, w["wave_upsampler.out_snake.alpha"], w["wave_upsampler.out_snake.beta"])

    spec = x @ w["istft_head.out.weight"].T + w["istft_head.out.bias"]
    return spec  # [frames, n_fft + 2]


def istft(spec, n_fft, hop):
    """Reference iSTFT (mio-tts-lib.cpp:625-756): zero-padded positive-exponent
    DFT scaled by 1/n_freq, periodic Hann OLA, hann^2 env, pad-crop."""
    L, bins = spec.shape
    n_freq = n_fft // 2 + 1
    assert bins == n_fft + 2
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    n_pad = (n_fft - hop) // 2
    n_out = (L - 1) * hop + n_fft

    audio_ola = np.zeros(n_out)
    env_ola = np.zeros(n_out)
    t = np.arange(n_fft)
    for l in range(L):
        mag = np.minimum(np.exp(spec[l, :n_freq]), 100.0)
        phi = spec[l, n_freq:]
        re = mag * np.cos(phi)
        im = mag * np.sin(phi)
        frame = np.zeros(n_fft)
        for k in range(n_freq):
            ang = 2.0 * np.pi * k * t / n_fft
            frame += re[k] * np.cos(ang) - im[k] * np.sin(ang)
        frame /= n_freq
        audio_ola[l * hop:l * hop + n_fft] += frame * hann
        env_ola[l * hop:l * hop + n_fft] += hann * hann

    audio = audio_ola.copy()
    nz = env_ola > 1e-12
    audio[nz] /= env_ola[nz]
    return audio[n_pad:n_out - n_pad]


def gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))


def encode_global_embedding(raw, n_layers, ssl):
    """Oracle for the ConvNeXt global encoder + attentive-stats pooling
    (miocodec-decoder.cpp:824-941). ssl: [T, in_channels] -> [out]."""
    x = conv1d_same(ssl, raw["global_encoder.backbone.embed.weight"],
                    raw["global_encoder.backbone.embed.bias"])
    x = layer_norm(x, raw["global_encoder.backbone.norm.weight"],
                   raw["global_encoder.backbone.norm.bias"], 1e-6)
    for i in range(n_layers):
        p = f"global_encoder.backbone.blk.{i}"
        res = x
        # depthwise conv
        w = raw[f"{p}.dwconv.weight"]  # [C, 1, k]
        C, _, K = w.shape
        pad = K // 2
        T = x.shape[0]
        xp = np.zeros((T + 2 * pad, C))
        xp[pad:pad + T] = x
        y = np.zeros((T, C))
        for t in range(T):
            y[t] = np.einsum("kc,ck->c", xp[t:t + K], w[:, 0, :])
        y = y + raw[f"{p}.dwconv.bias"]
        y = layer_norm(y, raw[f"{p}.norm.weight"], raw[f"{p}.norm.bias"], 1e-6)
        y = gelu_tanh(y @ raw[f"{p}.pw1.weight"].T + raw[f"{p}.pw1.bias"])
        y = y @ raw[f"{p}.pw2.weight"].T + raw[f"{p}.pw2.bias"]
        y = y * raw[f"{p}.gamma"]
        x = res + y
    x = layer_norm(x, raw["global_encoder.backbone.final_norm.weight"],
                   raw["global_encoder.backbone.final_norm.bias"], 1e-6)
    a = np.tanh(x @ raw["global_encoder.pool.attn0.weight"][:, :, 0].T
                + raw["global_encoder.pool.attn0.bias"])
    a = (a @ raw["global_encoder.pool.attn2.weight"][:, :, 0].T
         + raw["global_encoder.pool.attn2.bias"])
    e = np.exp(a - a.max(axis=0, keepdims=True))
    alpha = e / e.sum(axis=0, keepdims=True)  # softmax over T per channel
    mean = (alpha * x).sum(axis=0)
    m2 = (alpha * x * x).sum(axis=0)
    var = np.clip(m2 - mean * mean, 1e-4, 1e4)
    stat = np.concatenate([mean, np.sqrt(var)])
    out = stat @ raw["global_encoder.pool.proj.weight"].T + raw["global_encoder.pool.proj.bias"]
    return layer_norm(out, raw["global_encoder.pool.norm.weight"],
                      raw["global_encoder.pool.norm.bias"], 1e-5)
