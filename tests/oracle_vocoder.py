"""Independent numpy oracle for the MioVocoder mel->audio path
(miocodec-decoder.cpp:1666-2119). Channel-major [C, T] fmaps, scalar-ish
loops, written directly from the GGML op semantics."""

from __future__ import annotations

import numpy as np


def sinc1(x):
    return np.where(np.abs(x) < 1e-12, 1.0, np.sin(x) / np.where(x == 0, 1.0, x))


def hann_sym(n):
    if n <= 1:
        return np.ones(max(0, n))
    i = np.arange(n)
    return 0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))


def julius_lowpass_kernel(cutoff, zeros=8.0):
    if cutoff <= 0:
        return np.zeros(1)
    half = max(1, int(zeros / cutoff / 2.0))
    k = 2 * half + 1
    t = np.arange(k) - half
    x = 2.0 * cutoff * np.pi * t
    filt = 2.0 * cutoff * hann_sym(k) * sinc1(x)
    s = filt.sum()
    if abs(s) > 1e-12:
        filt = filt / s
    return filt


def pad_replicate(x, left, right):
    # x: [C, T]
    return np.concatenate([np.repeat(x[:, :1], left, axis=1), x,
                           np.repeat(x[:, -1:], right, axis=1)], axis=1)


def conv1d_same(x, w, b, dilation, padding):
    # x [Cin, T], w [Cout, Cin, K]
    Cout, Cin, K = w.shape
    T = x.shape[1]
    y = np.zeros((Cout, T))
    for t in range(T):
        acc = b.copy() if b is not None else np.zeros(Cout)
        for kk in range(K):
            ti = t + kk * dilation - padding
            if 0 <= ti < T:
                acc = acc + w[:, :, kk] @ x[:, ti]
        y[:, t] = acc
    return y


def conv1d_depthwise(x, filt, stride):
    k = len(filt)
    T = x.shape[1]
    out_t = (T - k) // stride + 1
    y = np.zeros((x.shape[0], max(0, out_t)))
    for t in range(out_t):
        y[:, t] = x[:, t * stride:t * stride + k] @ filt
    return y


def lowpass(x, cutoff, stride):
    filt = julius_lowpass_kernel(cutoff)
    if len(filt) == 1 and filt[0] == 0.0:
        return np.zeros((x.shape[0], (x.shape[1] + stride - 1) // stride))
    half = len(filt) // 2
    return conv1d_depthwise(pad_replicate(x, half, half), filt, stride)


def highpass(x, cutoff):
    return x - lowpass(x, cutoff, 1)


def upsample_activation(x, f):
    k = len(f)
    ratio = 2
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    xp = pad_replicate(x, pad, pad)
    out_full = (xp.shape[1] - 1) * ratio + k
    y = np.zeros((x.shape[0], out_full))
    for t in range(xp.shape[1]):
        y[:, t * ratio:t * ratio + k] += xp[:, t:t + 1] * ratio * f[None, :]
    return y[:, pad_left:out_full - pad_right]


def downsample_activation(x, f):
    k = len(f)
    even = k % 2 == 0
    pad_left = k // 2 - (1 if even else 0)
    pad_right = k // 2
    return conv1d_depthwise(pad_replicate(x, pad_left, pad_right), np.asarray(f), 2)


def adaa_snake_beta(x, alpha, beta):
    a = np.exp(alpha)[:, None]
    b = np.exp(beta)[:, None]
    inv = 1.0 / (2.0 * (b + 1e-9))
    prev = np.concatenate([np.zeros((x.shape[0], 1)), x[:, :-1]], axis=1)
    s = x + prev
    d = x - prev
    return s * 0.5 + inv * (1.0 - np.cos(a * s) * sinc1(a * d))


def activation1d(x, act):
    y = upsample_activation(x, act["up_filter"])
    y = adaa_snake_beta(y, act["alpha"], act["beta"])
    return downsample_activation(y, act["down_filter"])


def layer_norm_channels(x, w, b, eps):
    mean = x.mean(axis=0, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=0, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    if w is not None:
        y = y * w[:, None]
    if b is not None:
        y = y + b[:, None]
    return y


def decode_mel_to_audio(raw, cfg, mel_ct):
    """raw: dict of GGUF tensors (numpy-convention shapes); mel_ct: [n_mels, T]."""
    m = mel_ct.astype(np.float64)
    n_post = cfg["mel_postnet_layers"]
    if n_post:
        r = m.copy()
        for i in range(n_post):
            wt = raw[f"mel_postnet.{i}.conv.weight"]
            k = wt.shape[-1]
            r = conv1d_same(r, wt, raw[f"mel_postnet.{i}.conv.bias"], 1, max(0, (k - 1) // 2))
            r = layer_norm_channels(r, raw[f"mel_postnet.{i}.norm.weight"],
                                    raw[f"mel_postnet.{i}.norm.bias"], cfg["norm_eps"])
            if i + 1 < n_post:
                r = np.tanh(r)
        m = m + r

    x = conv1d_same(m, raw["vocoder.conv_pre.weight"], raw["vocoder.conv_pre.bias"], 1, 3)
    x0 = x.copy()
    rates = cfg["vocoder_upsample_rates"]
    num_k = cfg["vocoder_num_kernels"]
    dilations = [1, 3, 5]
    upp = 1
    for i, scale in enumerate(rates):
        upp *= scale
        y0 = np.zeros((x0.shape[0], x0.shape[1] * upp))
        y0[:, ::upp] = x0
        y0 = conv1d_same(y0, raw[f"vocoder.ups.{i}.noise.weight"],
                         raw[f"vocoder.ups.{i}.noise.bias"], 1, 3)
        y0 = highpass(y0, 0.5 / scale)

        y = np.zeros((x.shape[0], x.shape[1] * scale))
        y[:, ::scale] = x
        y = lowpass(y, 0.5 / scale, 1)
        y = y + y0
        x = (raw[f"vocoder.ups.{i}.after.weight"][:, :, 0] @ y
             + raw[f"vocoder.ups.{i}.after.bias"][:, None])

        xs = np.zeros_like(x)
        for j in range(num_k):
            rid = i * num_k + j
            r = x.copy()
            for kk in range(3):
                r_in = r.copy()
                act = {
                    "alpha": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk}.alpha"],
                    "beta": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk}.beta"],
                    "up_filter": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk}.up_filter"].reshape(-1),
                    "down_filter": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk}.down_filter"].reshape(-1),
                }
                r = activation1d(r, act)
                w1 = raw[f"vocoder.resblocks.{rid}.convs1.{kk}.weight"]
                d = dilations[kk]
                r = conv1d_same(r, w1, raw[f"vocoder.resblocks.{rid}.convs1.{kk}.bias"],
                                d, (w1.shape[-1] * d - d) // 2)
                act2 = {
                    "alpha": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk + 1}.alpha"],
                    "beta": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk + 1}.beta"],
                    "up_filter": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk + 1}.up_filter"].reshape(-1),
                    "down_filter": raw[f"vocoder.resblocks.{rid}.acts.{2 * kk + 1}.down_filter"].reshape(-1),
                }
                r = activation1d(r, act2)
                w2 = raw[f"vocoder.resblocks.{rid}.convs2.{kk}.weight"]
                r = conv1d_same(r, w2, raw[f"vocoder.resblocks.{rid}.convs2.{kk}.bias"],
                                1, (w2.shape[-1] - 1) // 2)
                r = r + r_in
            xs = xs + r
        x = xs / max(1, num_k)

    act = {
        "alpha": raw["vocoder.activation_post.alpha"],
        "beta": raw["vocoder.activation_post.beta"],
        "up_filter": raw["vocoder.activation_post.up_filter"].reshape(-1),
        "down_filter": raw["vocoder.activation_post.down_filter"].reshape(-1),
    }
    x = activation1d(x, act)
    x = conv1d_same(x, raw["vocoder.conv_post.weight"], None, 1, 3)
    return np.clip(x[0], -1.0, 1.0)
