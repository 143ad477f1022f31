"""BigVGAN-style MioVocoder: mel -> waveform (mel-mode models).

TPU-native re-design of decode_mel_to_audio (miocodec-decoder.cpp:1666-2119)
— the reference runs this entirely on CPU with scalar loops ("slowest path",
SURVEY §3.1); here every stage is a batched, length-masked XLA op:

- mel postnet: conv(pad=(k-1)/2) -> per-time channel LN -> tanh (residual)
- per upsample stage: zero-stuff + julius low-pass for the signal branch,
  zero-stuff + "noise" conv + high-pass for the source branch, 1x1 merge,
  then AMP resblocks (anti-aliased ADAA snake-beta between dilated convs)
- anti-aliased activation: 2x upsample (replicate-pad transposed filter),
  antiderivative snake-beta, 2x low-pass downsample

All ops are length-aware so padded length-buckets reproduce unpadded math.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masking import mask_time

Pytree = Any


# ---------------------------------------------------------------------------
# filters (host-precomputed; shapes depend only on static ints)
# ---------------------------------------------------------------------------

def _hann_symmetric(n: int) -> np.ndarray:
    if n <= 1:
        return np.ones(max(0, n), np.float32)
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))).astype(np.float32)


@functools.lru_cache(maxsize=32)
def julius_lowpass_kernel(cutoff: float, zeros: float = 8.0) -> np.ndarray:
    """Windowed-sinc low-pass (julius convention, miocodec-decoder.cpp:1709-1732)."""
    if cutoff <= 0.0:
        return np.zeros(1, np.float32)
    half = max(1, int(zeros / cutoff / 2.0))
    k = 2 * half + 1
    t = np.arange(k, dtype=np.float64) - half
    x = 2.0 * cutoff * np.pi * t
    s = np.where(np.abs(x) < 1e-12, 1.0, np.sin(x) / np.where(x == 0, 1.0, x))
    filt = 2.0 * cutoff * _hann_symmetric(k).astype(np.float64) * s
    total = filt.sum()
    if abs(total) > 1e-12:
        filt = filt / total
    return filt.astype(np.float32)


# ---------------------------------------------------------------------------
# length-aware primitives ([B, T, C] layout)
# ---------------------------------------------------------------------------

def replicate_pad(x: jnp.ndarray, lengths: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Replicate-pad along time using the *true* edges (0 and lengths-1).

    Implemented as static concat + a [B, 1, C] edge gather + an elementwise
    select: a full [B, T, C] gather serializes on TPU (~76 ms at the
    vocoder's waveform lengths vs ~8 ms for this form — it was the dominant
    cost of the whole mel-vocoder forward)."""
    B, T, C = x.shape
    if left == 0 and right == 0:
        return x
    first = jnp.broadcast_to(x[:, :1, :], (B, max(left, 1), C))[:, :left, :]
    edge = jnp.take_along_axis(
        x, jnp.maximum(lengths - 1, 0).astype(jnp.int32)[:, None, None],
        axis=1)  # [B, 1, C]
    out = jnp.concatenate(
        [first, x, jnp.zeros((B, right, C), x.dtype)], axis=1)
    # every position at or past the true end reads the edge value
    idx = jnp.arange(-left, T + right, dtype=jnp.int32)[None, :]
    beyond = idx >= lengths[:, None]
    return jnp.where(beyond[:, :, None], edge, out)


def conv1d_zeropad(x, w, b, dilation: int, padding: int,
                   groups: int = 1) -> jnp.ndarray:
    """conv1d_same semantics (miocodec-decoder.cpp:1751-1781): explicit
    zero padding, output length == input length. w: torch [out, in/groups, k];
    ``groups`` runs a block-diagonal (grouped) conv — used to fuse a stage's
    AMP resblock branches into one pass."""
    w_wio = jnp.transpose(w, (2, 1, 0)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w_wio, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def depthwise_strided(x, filt: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Per-channel FIR, valid padding. filt: [k] (one filter for every
    channel) or [k, C] (a per-channel filter bank — the fused-resblock path
    carries a different anti-aliasing filter per branch)."""
    C = x.shape[-1]
    k = filt.shape[0]
    if filt.ndim == 2:
        w = filt[:, None, :].astype(x.dtype)  # [k, 1, C]
    else:
        w = jnp.broadcast_to(filt[:, None, None], (k, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def zero_stuff(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Insert factor-1 zeros between samples: out[t*factor] = x[t]."""
    B, T, C = x.shape
    y = jnp.zeros((B, T, factor, C), x.dtype)
    y = y.at[:, :, 0, :].set(x)
    return y.reshape(B, T * factor, C)


def lowpass(x, lengths, cutoff: float, stride: int = 1):
    filt = julius_lowpass_kernel(round(float(cutoff), 9))
    if filt.shape[0] == 1 and filt[0] == 0.0:
        T_out = (x.shape[1] + stride - 1) // stride
        return jnp.zeros((x.shape[0], T_out, x.shape[2]), x.dtype), (lengths + stride - 1) // stride
    half = filt.shape[0] // 2
    xp = replicate_pad(mask_time(x, lengths), lengths, half, half)
    y = depthwise_strided(xp, jnp.asarray(filt), stride)
    # padded conv out: (T + 2*half - k)/stride + 1 = (T-1)/stride + 1
    new_len = (lengths - 1) // stride + 1
    return mask_time(y, new_len), new_len


def highpass(x, lengths, cutoff: float):
    low, _ = lowpass(x, lengths, cutoff, 1)
    return mask_time(x - low, lengths)


def per_time_layer_norm(x, w, b, eps: float):
    """LayerNorm over channels at each time step (:1803-1841)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def upsample_activation(x, lengths, up_filter: jnp.ndarray):
    """2x transposed-filter upsample with replicate pad + crop (:1888-1917)."""
    k = up_filter.shape[0]
    ratio = 2
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    xp = replicate_pad(mask_time(x, lengths), lengths, pad, pad)  # [B, T+2p, C]
    # transposed conv: out[t*2 + kk] += x[t] * 2 * f[kk]
    B, Tp, C = xp.shape
    stuffed = zero_stuff(xp * ratio, ratio)  # [B, Tp*2, C]
    if up_filter.ndim == 2:  # per-channel bank (fused-resblock path)
        w = up_filter[::-1, None, :].astype(x.dtype)  # [k, 1, C]
    else:
        w = jnp.broadcast_to(up_filter[::-1][:, None, None],
                             (k, 1, C)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        stuffed, w, window_strides=(1,), padding=[(k - 1, k - 1)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # y length = Tp*2 + k - 1; reference full length (Tp-1)*2 + k = Tp*2 + k - 2:
    # conv of zero-stuffed signal produces one extra trailing tap — identical
    # values on [0, (Tp-1)*2+k). Crop [pad_left, full-pad_right).
    full = (Tp - 1) * ratio + k
    y = y[:, pad_left:full - pad_right, :]
    new_len = jnp.maximum((lengths + 2 * pad - 1) * ratio + k - pad_left - pad_right, 0)
    return mask_time(y, new_len), new_len


def adaa_snake_beta(x, lengths, alpha: jnp.ndarray, beta: jnp.ndarray):
    """Antiderivative-antialiased snake-beta (:1933-1951):
    y[t] = (x[t]+x[t-1])/2 + (1 - cos(a*sum)*sinc(a*delta)) / (2*(e^b+1e-9))
    with x[-1] = 0."""
    a = jnp.exp(alpha.astype(jnp.float32))
    b = jnp.exp(beta.astype(jnp.float32))
    inv = 1.0 / (2.0 * (b + 1e-9))
    xf = x.astype(jnp.float32)
    prev = jnp.pad(xf, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    s = xf + prev
    d = xf - prev
    ad = a * d
    sinc = jnp.where(jnp.abs(ad) < 1e-12, 1.0, jnp.sin(ad) / jnp.where(ad == 0, 1.0, ad))
    y = s * 0.5 + inv * (1.0 - jnp.cos(a * s) * sinc)
    return mask_time(y.astype(x.dtype), lengths)


def downsample_activation(x, lengths, down_filter: jnp.ndarray):
    """Replicate-pad + stride-2 FIR (:1919-1931)."""
    k = down_filter.shape[0]
    even = (k % 2 == 0)
    pad_left = k // 2 - (1 if even else 0)
    pad_right = k // 2
    xp = replicate_pad(mask_time(x, lengths), lengths, pad_left, pad_right)
    y = depthwise_strided(xp, down_filter, 2)
    # out length = (T + pad_l + pad_r - k)/2 + 1
    new_len = (lengths + pad_left + pad_right - k) // 2 + 1
    return mask_time(y, new_len), new_len


def _act1d_impl() -> str:
    import os

    return os.environ.get("MIOTTS_ACT1D", "auto")


def conv1d_same(x, lengths, w, b, dilation: int = 1, residual=None,
                impl: str | None = None):
    """mask_time(conv1d_zeropad(...)) [+ residual], dispatched to the
    Pallas shifted-matmul kernel on TPU (XLA:TPU lowers these dilated convs
    at ~4x the MXU roofline at waveform lengths — ops/pallas/conv1d.py);
    the bias/residual/mask ride in the same kernel. MIOTTS_ACT1D gates both
    this and activation1d (they ship as one TPU fast path); an explicit
    ``impl`` overrides the env (the sp path pins "xla": a pallas_call is
    opaque to the GSPMD partitioner, same constraint as blocked attention)."""
    impl = impl or _act1d_impl()
    k = int(w.shape[-1])
    if impl != "xla" and k % 2 == 1:
        from ..ops.attention import _pallas_available
        from ..ops.pallas.conv1d import conv1d_same_pallas

        if impl in ("pallas", "interpret") or (
                impl == "auto" and _pallas_available()):
            return conv1d_same_pallas(x, lengths, w, b, dilation,
                                      residual=residual,
                                      interpret=(impl == "interpret"))
    y = mask_time(conv1d_zeropad(x, w, b, dilation, (k * dilation
                                                     - dilation) // 2),
                  lengths)
    if residual is not None:
        y = y + residual
    return y


def activation1d(x, lengths, act: Pytree, impl: str | None = None):
    """Anti-aliased snake: 2x upsample -> ADAA snake-beta -> 2x downsample.

    On TPU this dispatches to the fused Pallas kernel (one VMEM-resident
    pass instead of ~15 XLA memory passes — the mel-vocoder's dominant
    cost, see ops/pallas/activation1d.py). The unfused composite remains
    the non-TPU / filter-bank (fused-resblock) path and the numeric
    reference. MIOTTS_ACT1D=xla|pallas|interpret overrides; an explicit
    ``impl`` argument overrides the env (see conv1d_same)."""
    impl = impl or _act1d_impl()
    fusable = (act["up_filter"].ndim == 1 and act["down_filter"].ndim == 1
               and act["up_filter"].shape[0] >= 2)
    if fusable and impl != "xla":
        from ..ops.attention import _pallas_available
        from ..ops.pallas.activation1d import fused_activation1d

        if impl in ("pallas", "interpret") or (
                impl == "auto" and _pallas_available()):
            return fused_activation1d(
                x, lengths, act["up_filter"], act["alpha"], act["beta"],
                act["down_filter"], interpret=(impl == "interpret"))
    y, ln = upsample_activation(x, lengths, act["up_filter"])
    y = adaa_snake_beta(y, ln, act["alpha"], act["beta"])
    return downsample_activation(y, ln, act["down_filter"])


# ---------------------------------------------------------------------------
# full vocoder forward
# ---------------------------------------------------------------------------

def _stack_branch_kernels(ws, bs):
    """Stack per-branch conv kernels [(C, C, k_j)] into one grouped-conv
    weight [nk*C, C, k_max]. Centered zero-extension of an odd kernel is
    exact: 'same' padding computed at k_max shifts exactly by the extension."""
    k_max = max(w.shape[-1] for w in ws)
    padded = []
    for w in ws:
        k = w.shape[-1]
        lo = (k_max - k) // 2
        padded.append(jnp.pad(w, ((0, 0), (0, 0), (lo, k_max - k - lo))))
    return jnp.concatenate(padded, axis=0), jnp.concatenate(bs), k_max


def _can_fuse_resblocks(rbs) -> bool:
    import os

    # OFF by default: measured SLOWER on TPU (13.5x vs 16.4x RT at
    # production shapes) — XLA:TPU lowers feature_group_count convs worse
    # than the 3x memory-pass saving is worth. Kept as an opt-in
    # (MIOTTS_VOCODER_FUSE=1) for backends where grouped convs win; the
    # math is oracle-verified including ragged kernel sizes.
    if os.environ.get("MIOTTS_VOCODER_FUSE", "0") in ("0", "off", ""):
        return False
    for a in range(6):
        # per-channel filter banks need equal filter lengths per slot
        if len({rb["acts"][a]["up_filter"].shape[0] for rb in rbs}) > 1:
            return False
        if len({rb["acts"][a]["down_filter"].shape[0] for rb in rbs}) > 1:
            return False
    for kk in range(3):
        # centered zero-extension to k_max is exact only for same-parity k
        for key in ("convs1", "convs2"):
            if len({rb[key][kk]["w"].shape[-1] % 2 for rb in rbs}) > 1:
                return False
    return True


def _resblocks_fused(rbs, x, lengths, dilations, impl: str | None = None):
    """Run a stage's AMP resblocks as one channel-folded pass and average.

    Every branch consumes the same stage input and the outputs are averaged
    (miocodec-decoder.cpp:2064-2079), so the branches fold into the channel
    dim: grouped convs (block-diagonal), per-channel anti-aliasing filter
    banks, and concatenated snake alpha/beta — 3x fewer full-length memory
    passes than looping branches (the vocoder is bandwidth-bound, see
    DESIGN.md). Ragged odd kernel sizes are zero-extended to the slot max
    (exact; `_stack_branch_kernels`)."""
    nk = len(rbs)
    B, T, C = x.shape

    def act_bank(a):
        f_up = rbs[0]["acts"][a]["up_filter"]
        f_dn = rbs[0]["acts"][a]["down_filter"]
        return {
            "alpha": jnp.concatenate([rb["acts"][a]["alpha"] for rb in rbs]),
            "beta": jnp.concatenate([rb["acts"][a]["beta"] for rb in rbs]),
            "up_filter": jnp.concatenate(
                [jnp.broadcast_to(rb["acts"][a]["up_filter"][:, None],
                                  (f_up.shape[0], C)) for rb in rbs], axis=1),
            "down_filter": jnp.concatenate(
                [jnp.broadcast_to(rb["acts"][a]["down_filter"][:, None],
                                  (f_dn.shape[0], C)) for rb in rbs], axis=1),
        }

    r = jnp.tile(x, (1, 1, nk))  # [B, T, nk*C]
    r_len = lengths
    for kk in range(3):
        r_in = r
        r, r_len = activation1d(r, r_len, act_bank(2 * kk), impl=impl)
        w1, b1, k1 = _stack_branch_kernels(
            [rb["convs1"][kk]["w"] for rb in rbs],
            [rb["convs1"][kk]["b"] for rb in rbs])
        d = dilations[kk]
        r = conv1d_zeropad(r, w1, b1, d, (k1 * d - d) // 2, groups=nk)
        r = mask_time(r, r_len)
        r, r_len = activation1d(r, r_len, act_bank(2 * kk + 1), impl=impl)
        w2, b2, k2 = _stack_branch_kernels(
            [rb["convs2"][kk]["w"] for rb in rbs],
            [rb["convs2"][kk]["b"] for rb in rbs])
        r = conv1d_zeropad(r, w2, b2, 1, (k2 - 1) // 2, groups=nk)
        r = mask_time(r, r_len)
        r = r + r_in  # activation1d round-trip preserves length
    out = r.reshape(B, r.shape[1], nk, C).sum(2) * (1.0 / nk)
    return mask_time(out, r_len), r_len


def mel_postnet_apply(cfg, w, mel: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Residual mel postnet (:2001-2020). mel: [B, T, n_mels]."""
    if "mel_postnet" not in w:
        return mel
    blocks = w["mel_postnet"]
    n = blocks["conv_w"].shape[0]
    r = mel
    for i in range(n):
        blk = jax.tree.map(lambda a: a[i], blocks)
        k = blk["conv_w"].shape[-1]
        r = mask_time(r, lengths)
        r = conv1d_zeropad(r, blk["conv_w"], blk["conv_b"], 1, max(0, (k - 1) // 2))
        r = per_time_layer_norm(r, blk["norm_w"], blk["norm_b"], cfg.norm_eps)
        if i + 1 < n:
            r = jnp.tanh(r)
    return mel + mask_time(r, lengths)


def _resblock_layer(r, r_len, rb, kk: int, dil: int,
                    impl: str | None = None):
    """One resblock layer: conv2(actB(conv1(actA(r)))) + r, same length.

    On TPU the whole layer runs as ONE Pallas kernel
    (ops/pallas/resblock.py): the four ops otherwise pay three
    waveform-length HBM round trips between them, and the layer family is
    ~78% of the vocoder forward (scripts/bench_vocoder_ablate.py). The
    unfused chain below is the reference semantics and the small-input /
    non-TPU path; MIOTTS_RESBLOCK_FUSE=0 restores it everywhere."""
    import os

    actA, actB = rb["acts"][2 * kk], rb["acts"][2 * kk + 1]
    w1, b1 = rb["convs1"][kk]["w"], rb["convs1"][kk]["b"]
    w2, b2 = rb["convs2"][kk]["w"], rb["convs2"][kk]["b"]
    eff_impl = impl or _act1d_impl()
    fusable = (
        eff_impl != "xla"
        and os.environ.get("MIOTTS_RESBLOCK_FUSE", "1") != "0"
        and actA["up_filter"].ndim == 1 and actB["up_filter"].ndim == 1
        and actA["up_filter"].shape[0] >= 2 and actB["up_filter"].shape[0] >= 2
        and w1.shape[-1] % 2 == 1 and w2.shape[-1] % 2 == 1
        and b1 is not None and b2 is not None
        and w1.shape[0] == w1.shape[1] == r.shape[-1]
        and w2.shape[0] == w2.shape[1] == r.shape[-1]
        and r.shape[1] >= 1024)
    if fusable:
        from ..ops.attention import _pallas_available

        if eff_impl in ("pallas", "interpret") or (
                eff_impl == "auto" and _pallas_available()):
            from ..ops.pallas.resblock import fused_resblock_layer

            return fused_resblock_layer(
                r, r_len, actA, w1, b1, dil, actB, w2, b2,
                interpret=(eff_impl == "interpret"))
    r_in = r
    r1, l1 = activation1d(r, r_len, actA, impl=impl)
    r1 = conv1d_same(r1, l1, w1, b1, dil, impl=impl)
    r2, l2 = activation1d(r1, l1, actB, impl=impl)
    # conv2 + residual + mask fused in one kernel
    # (activation1d round-trip preserves length)
    return conv1d_same(r2, l2, w2, b2, 1, residual=r_in, impl=impl)


def vocoder_decode(cfg, w, mel: jnp.ndarray, lengths: jnp.ndarray,
                   impl: str | None = None):
    """mel [B, T, n_mels] -> (audio [B, S], n_samples [B]).
    Mirrors decode_mel_to_audio (:1967-2119). ``impl`` pins the
    conv1d_same/activation1d dispatch (the sp path forces "xla")."""
    v = w["vocoder"]
    rates = cfg.vocoder_upsample_rates
    num_k = cfg.vocoder_num_kernels
    mel = mask_time(mel, lengths)
    mel = mel_postnet_apply(cfg, w, mel, lengths)

    x = conv1d_zeropad(mel, v["conv_pre_w"], v["conv_pre_b"], 1, 3)
    x = mask_time(x, lengths)
    x0 = x
    x0_len = lengths
    cur_len = lengths

    upp = 1
    dilations = (1, 3, 5)
    for i, scale in enumerate(rates):
        upp *= scale
        up = v["ups"][i]

        y0 = zero_stuff(mask_time(x0, x0_len), upp)
        y0_len = x0_len * upp
        y0 = conv1d_same(y0, y0_len, up["noise_w"], up["noise_b"], 1, impl=impl)
        y0 = highpass(y0, y0_len, 0.5 / scale)

        y = zero_stuff(mask_time(x, cur_len), scale)
        y_len = cur_len * scale
        y, y_len = lowpass(y, y_len, 0.5 / scale, 1)
        y = y + y0
        x = y @ jnp.transpose(up["after_w"][:, :, 0]) + up["after_b"]  # 1x1 conv
        cur_len = y_len
        x = mask_time(x, cur_len)

        stage_rbs = v["resblocks"][i * num_k:(i + 1) * num_k]
        if num_k > 1 and _can_fuse_resblocks(stage_rbs):
            x, _ = _resblocks_fused(stage_rbs, x, cur_len, dilations, impl=impl)
        else:
            xs = jnp.zeros_like(x)
            for rb in stage_rbs:
                r = x
                r_len = cur_len
                for kk in range(3):
                    r = _resblock_layer(r, r_len, rb, kk, dilations[kk],
                                        impl)
                xs = xs + r
            x = xs * (1.0 / max(1, num_k))

    x, cur_len = activation1d(x, cur_len, v["activation_post"], impl=impl)
    x = conv1d_zeropad(x, v["conv_post_w"], None, 1, 3)
    x = mask_time(x, cur_len)
    audio = jnp.clip(x[:, :, 0], -1.0, 1.0)
    return audio, cur_len


def load_vocoder_weights(reader_get, cfg) -> Pytree:
    """Read vocoder tensors (names: convert_miocodec_to_gguf.py:618-670)."""
    v: dict[str, Any] = {
        "conv_pre_w": reader_get("vocoder.conv_pre.weight"),
        "conv_pre_b": reader_get("vocoder.conv_pre.bias"),
        "conv_post_w": reader_get("vocoder.conv_post.weight"),
    }
    v["ups"] = [{
        "after_w": reader_get(f"vocoder.ups.{i}.after.weight"),
        "after_b": reader_get(f"vocoder.ups.{i}.after.bias"),
        "noise_w": reader_get(f"vocoder.ups.{i}.noise.weight"),
        "noise_b": reader_get(f"vocoder.ups.{i}.noise.bias"),
    } for i in range(len(cfg.vocoder_upsample_rates))]
    n_rb = len(cfg.vocoder_upsample_rates) * cfg.vocoder_num_kernels
    v["resblocks"] = [{
        "convs1": [{"w": reader_get(f"vocoder.resblocks.{r}.convs1.{c}.weight"),
                    "b": reader_get(f"vocoder.resblocks.{r}.convs1.{c}.bias")}
                   for c in range(3)],
        "convs2": [{"w": reader_get(f"vocoder.resblocks.{r}.convs2.{c}.weight"),
                    "b": reader_get(f"vocoder.resblocks.{r}.convs2.{c}.bias")}
                   for c in range(3)],
        "acts": [{"alpha": reader_get(f"vocoder.resblocks.{r}.acts.{a}.alpha"),
                  "beta": reader_get(f"vocoder.resblocks.{r}.acts.{a}.beta"),
                  "up_filter": reader_get(f"vocoder.resblocks.{r}.acts.{a}.up_filter").reshape(-1),
                  "down_filter": reader_get(f"vocoder.resblocks.{r}.acts.{a}.down_filter").reshape(-1)}
                 for a in range(6)],
    } for r in range(n_rb)]
    v["activation_post"] = {
        "alpha": reader_get("vocoder.activation_post.alpha"),
        "beta": reader_get("vocoder.activation_post.beta"),
        "up_filter": reader_get("vocoder.activation_post.up_filter").reshape(-1),
        "down_filter": reader_get("vocoder.activation_post.down_filter").reshape(-1),
    }
    return v
