"""Fused anti-aliased snake activation (BigVGAN Activation1d) Pallas kernel.

The mel-vocoder calls `activation1d` ~90 times per forward (5 stages x 3
resblocks x 6 activations + post): 2x transposed-filter upsample -> ADAA
snake-beta -> stride-2 FIR downsample (miocodec-decoder.cpp:1888-1951).
The unfused XLA lowering runs ~15 full-length memory passes per call
(replicate-pad materialization, zero-stuff, two grouped convs, the snake's
elementwise chain, masks) and was the dominant cost of the mel path
(DESIGN.md: 16-21x RT, "bound by conv lowering + ~100 elementwise
activation passes").

This kernel computes the whole composite in one VMEM-resident pass per
time tile:

- the 2x upsample is algebraically reduced to two polyphase FIRs over the
  *input-rate* signal (even/odd output phases, ~k/2 taps each) — the
  zero-stuffed intermediate never exists;
- the ADAA snake (which needs the previous 2x-rate sample) is evaluated on
  both phase buffers; `prev` of even phase s is odd phase s-1, `prev` of
  odd phase s is even phase s — both in-tile;
- the stride-2 downsample reads only matching-parity phase buffers, so the
  2x-rate signal is never materialized either;
- replicate-pad edge semantics (the pad reads x[0] / x[len-1] at the true
  per-batch boundaries) are applied by masked select against the global
  position, with the edge values extracted by masked sum (each global
  index appears in exactly one row of the window);
- output positions >= length are zeroed (the length-masking invariant).

Output length provably equals input length for every (k_up, k_down)
geometry (the crop/pad arithmetic telescopes — see the derivation in
fused_activation1d), so lengths pass through unchanged.

Pure-BlockSpec pipelining: the time halo (a few taps, <= 32 rows) comes
from two extra clamped-index-map block inputs (the banded-attention
pattern — no manual DMA; the remote AOT helper crashes on it). Total HBM
traffic is ~1.1 reads + 1 write of [B, T, C] vs ~15 passes unfused.

block_t default 160: round-5 sweep in-graph per-call at [2, 245760, 128]
(v5e, scripts/bench_act1d_chain.py, post fast-sincos): 6.06 ms at bt=96,
5.34-5.52 at 160, 5.79 at 192, 6.80 at 224, 6.28 at 256, 7.26 at 512 —
non-monotonic; 160 is the measured minimum (~15% under the old 256
default). Fresh ablations at bt=256: copy floor 1.99, +FIRs 2.60,
+snake-only 5.14, full 6.28 — after the round-4 Cody-Waite/minimax trig
the snake's ~45 VPU ops/elem over both 2x-rate phase buffers remain the
dominator, with the copy floor at ~1/3 of the total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)


def _geometry(k1: int, k2: int):
    """Static polyphase geometry for (up k1, down k2).

    Upsample (miocodec-decoder.cpp:1888-1917 / models/vocoder.py
    upsample_activation): pad = k1//2-1, crop pad_left = 2*pad+(k1-2)//2.
    up[u] = 2 * sum_{m = u+pad_left (mod 2)} f[m] * xr((u+pad_left-m)/2 - pad)
    where xr is the replicate-extended input. Splitting u = 2s / 2s+1 gives
    two FIRs over xr with static offsets A_e/A_o and k1/2 taps.

    Downsample: out[t] = sum_j f2[j] * z~(2t - pl2 + j); each tap j maps to
    one phase buffer at static offset s_off.
    """
    pad = k1 // 2 - 1
    pl1 = pad * 2 + (k1 - 2) // 2
    p0 = pl1 % 2  # filter-index parity feeding even outputs
    p1 = 1 - p0
    a_e = (pl1 - p0) // 2 - pad
    a_o = (1 + pl1 - p1) // 2 - pad
    n_e = (k1 - p0 + 1) // 2
    n_o = (k1 - p1 + 1) // 2
    pl2 = k2 // 2 - (1 if k2 % 2 == 0 else 0)
    taps = []  # (phase, s_off, j)
    for j in range(k2):
        u_off = j - pl2
        if u_off % 2 == 0:
            taps.append(("e", u_off // 2, j))
        else:
            taps.append(("o", (u_off - 1) // 2, j))
    g_lo = max(0, -min(s for _, s, _ in taps))
    g_hi = max(0, max(s for _, s, _ in taps))
    h_lo = g_lo + 1 + max(n_e - 1 - a_e, n_o - 1 - a_o, 0)
    h_hi = g_hi + max(a_e, a_o, 0)
    return dict(p0=p0, p1=p1, a_e=a_e, a_o=a_o, n_e=n_e, n_o=n_o,
                taps=taps, g_lo=g_lo, g_hi=g_hi, h_lo=h_lo, h_hi=h_hi)


def _ablate_mode() -> str:
    """Perf-experiment hook (scripts/bench_act1d_variants.py): "nosnake"
    skips the ADAA snake (isolating FIR cost), "nofir" skips the polyphase
    FIRs (isolating snake cost). NOT for production use — outputs are
    wrong by construction."""
    import os

    return os.environ.get("MIOTTS_ACT1D_ABLATE", "full")


def _sincos_mode() -> str:
    """"fast" (default): in-kernel Cody-Waite + minimax sin/cos (below);
    "xla": the stock jnp.sin/jnp.cos lowering, kept for A/B measurement."""
    import os

    return os.environ.get("MIOTTS_ACT1D_SINCOS", "fast")


# π/2 split for Cody-Waite reduction: C1/C2 keep only 12 mantissa bits, so
# k·C1 and k·C2 are EXACT f32 products for |k| ≤ 2^12 (12+12 ≤ 24 mantissa
# bits) and the first two subtractions cancel without rounding;
# C1+C2+C3 carries π/2 to ~1.7e-15. Worst-case reduced-argument error
# ~1e-7 at the clamp bound (rounding of k·C3), inside the kernel's 2e-6
# parity budget. The clamp bounds |k| ≤ 2^12: snake arguments a·x beyond
# ±6433 are far outside any audio-range activation.
_PIO2_C1 = 1.5703125
_PIO2_C2 = 4.837512969970703e-04
_PIO2_C3 = 7.549790126404332e-08
_SINCOS_CLAMP = 6433.0  # |k| ≤ 4096 = 2^12


def _fast_sincos(theta, want_sin: bool, want_cos: bool):
    """Vectorized f32 sin/cos: round-to-nearest quadrant reduction to
    r ∈ [-π/4, π/4], degree-7/6 minimax polys, quadrant select.

    ~15 VPU ops per requested output vs the generic jnp.sin/jnp.cos
    lowering (branchy large-argument reduction) — the snake's sin/cos
    pair is the measured dominator of the fused Activation1d kernel
    (block comment above: ~6-7 of 9.6 ms/call at the top vocoder stage).
    Max abs error ~1e-7 on [-3e4, 3e4] (tests/test_vocoder.py
    test_fast_sincos_accuracy); arguments beyond the clamp are pinned to
    ±3e4 (the snake's a·x there is far past any audio-range value).
    """
    t = jnp.clip(theta, -_SINCOS_CLAMP, _SINCOS_CLAMP)
    kf = jnp.round(t * (2.0 / jnp.pi))
    q = kf.astype(jnp.int32)
    r = t - kf * _PIO2_C1
    r = r - kf * _PIO2_C2
    r = r - kf * _PIO2_C3
    r2 = r * r
    # Cephes sinf/cosf minimax coefficients on [-π/4, π/4]
    ps = r + r * r2 * (-1.6666654611e-1
                       + r2 * (8.3321608736e-3 + r2 * (-1.9515295891e-4)))
    pc = 1.0 - 0.5 * r2 + r2 * r2 * (
        4.166664568298827e-2
        + r2 * (-1.388731625493765e-3 + r2 * 2.443315711809948e-5))
    odd = (q & 1) == 1
    flip_s = (q & 2) == 2          # sin sign flips in quadrants 2,3
    out_s = out_c = None
    if want_sin:
        s = jnp.where(odd, pc, ps)
        out_s = jnp.where(flip_s, -s, s)
    if want_cos:
        flip_c = ((q + 1) & 2) == 2  # cos sign flips in quadrants 1,2
        c = jnp.where(odd, ps, pc)
        out_c = jnp.where(flip_c, -c, c)
    return out_s, out_c


def fast_sin(theta):
    return _fast_sincos(theta, True, False)[0]


def fast_cos(theta):
    return _fast_sincos(theta, False, True)[1]


@functools.partial(
    jax.jit,
    static_argnames=("k1", "k2", "block_t", "interpret", "ablate", "sincos"))
def _fused_call(x, lengths, fu, fd, a_vec, inv_vec, k1, k2, block_t,
                interpret, ablate="full", sincos="fast"):
    B, T, C = x.shape
    g = _geometry(k1, k2)
    h_lo, h_hi = g["h_lo"], g["h_hi"]
    g_lo, g_hi = g["g_lo"], g["g_hi"]
    halo = max(h_lo, h_hi, 1)
    hb = max(32, ((halo + 31) // 32) * 32)  # halo block rows (32-aligned)
    bt = block_t
    while bt % hb:
        bt += hb - (bt % hb)
    tp = ((T + bt - 1) // bt) * bt
    if tp != T:
        x = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))
    nt = tp // bt
    n_hb = tp // hb
    ratio = bt // hb
    gz = g_lo + 1 + bt + g_hi  # up-phase buffer rows (one extra for prev)
    r_w = h_lo + bt + h_hi  # input window rows

    def kernel(len_ref, xl, xc, xr, fu_ref, fd_ref, av, iv, o_ref):
        i = pl.program_id(1)
        t0 = i * bt
        b = pl.program_id(0)
        length = len_ref[b]

        w_raw = jnp.concatenate(
            [xl[0, hb - h_lo:, :], xc[0], xr[0, :h_hi, :]],
            axis=0).astype(jnp.float32)  # [r_w, C]
        a = av[0:1, :]
        inv = iv[0:1, :]

        def snake(xv, pv):
            # ADAA snake-beta (:1933-1951): y = (x+prev)/2
            #   + (1 - cos(a*(x+prev)) * sinc(a*(x-prev))) / (2*(e^b+1e-9))
            # The 1/ad divide runs as approx-reciprocal + one Newton step
            # (measured 1.8e-7-class rel error on chip with the f32
            # composite as reference — scripts/check_act1d_tpu.py) — the
            # VPU divide was ~15% of the snake's op budget.
            s_ = xv + pv
            d_ = xv - pv
            ad = a * d_
            tiny = jnp.abs(ad) < 1e-12
            ad_safe = jnp.where(tiny, 1.0, ad)
            if interpret:
                r = 1.0 / ad_safe
            else:
                r = pl.reciprocal(ad_safe, approx=True)
                r = r * (2.0 - ad_safe * r)
            if sincos == "fast":
                sin_ad = fast_sin(ad)
                cos_as = fast_cos(a * s_)
            else:
                sin_ad = jnp.sin(ad)
                cos_as = jnp.cos(a * s_)
            sinc = jnp.where(tiny, 1.0, sin_ad * r)
            return s_ * 0.5 + inv * (1.0 - cos_as * sinc)

        def compute(edges: bool):
            # replicate-extend x at the true per-batch edges: positions < 0
            # read x[0], positions >= length read x[length-1]
            # (models/vocoder.py replicate_pad). Each global index is in
            # exactly one row, so a masked sum extracts the edge value;
            # tiles entirely past `length` produce garbage edges but every
            # output row there is zeroed below.
            if edges:
                rows = jax.lax.broadcasted_iota(jnp.int32, (r_w, 1), 0)
                glob = t0 - h_lo + rows
                x_first = w_raw[h_lo:h_lo + 1, :]
                x_edge = jnp.sum(jnp.where(glob == length - 1, w_raw, 0.0),
                                 axis=0, keepdims=True)
                w = jnp.where(glob < 0, x_first,
                              jnp.where(glob >= length, x_edge, w_raw))
            else:
                w = w_raw

            # polyphase upsample: up_e[s] = up[2s], up_o[s] = up[2s+1]
            base_e = h_lo - (g_lo + 1) + g["a_e"]
            base_o = h_lo - (g_lo + 1) + g["a_o"]
            if ablate == "nofir":
                up_e = w[:gz, :]
                up_o = w[1:gz + 1, :]
            else:
                up_e = jnp.zeros((gz, C), jnp.float32)
                up_o = jnp.zeros((gz, C), jnp.float32)
                for r in range(g["n_e"]):
                    up_e += (fu_ref[0, 2 * r + g["p0"]]
                             * w[base_e - r:base_e - r + gz, :])
                for r in range(g["n_o"]):
                    up_o += (fu_ref[0, 2 * r + g["p1"]]
                             * w[base_o - r:base_o - r + gz, :])
                up_e *= 2.0
                up_o *= 2.0

            if edges:
                s_glob = (t0 - g_lo
                          + jax.lax.broadcasted_iota(jnp.int32, (gz - 1, 1), 0))
                # prev of 2x-sample 0 is 0 (the reference zero-pads there)
                prev_e = jnp.where(s_glob == 0, 0.0, up_o[:gz - 1, :])
            else:
                prev_e = up_o[:gz - 1, :]
            if ablate == "nosnake":
                z_e = up_e[1:, :] + prev_e
                z_o = up_o[1:, :] + up_e[1:, :]
            else:
                z_e = snake(up_e[1:, :], prev_e)
                z_o = snake(up_o[1:, :], up_e[1:, :])

            if edges:
                # replicate-extend z at the 2x-rate edges for the downsample
                # pad: 2x position < 0 reads z[0] (even phase, s=0);
                # >= 2*length reads z[2*length-1] (odd phase, s=length-1)
                z_first = jnp.sum(jnp.where(s_glob == 0, z_e, 0.0),
                                  axis=0, keepdims=True)
                z_edge = jnp.sum(jnp.where(s_glob == length - 1, z_o, 0.0),
                                 axis=0, keepdims=True)
                z_e = jnp.where(s_glob < 0, z_first,
                                jnp.where(s_glob >= length, z_edge, z_e))
                z_o = jnp.where(s_glob < 0, z_first,
                                jnp.where(s_glob >= length, z_edge, z_o))

            out = jnp.zeros((bt, C), jnp.float32)
            for ph, s_off, j in g["taps"]:
                buf = z_e if ph == "e" else z_o
                sl = g_lo + s_off
                out += fd_ref[0, j] * buf[sl:sl + bt, :]
            if edges:
                tpos = t0 + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
                out = jnp.where(tpos < length, out, 0.0)
            return out.astype(o_ref.dtype)

        if ablate == "copy":  # structure-floor measurement: window in, out
            o_ref[0] = w_raw[h_lo:h_lo + bt, :].astype(o_ref.dtype)
            return

        # interior tiles (everything they touch is strictly inside
        # [0, length)) skip the whole edge-clamp apparatus — ~11 fewer
        # full-buffer VPU passes on a kernel that is VPU-bound
        interior = ((t0 - h_lo >= 0)
                    & (t0 + bt + max(h_hi, g_hi + 1) <= length))

        @pl.when(interior)
        def _():
            o_ref[0] = compute(False)

        @pl.when(jnp.logical_not(interior))
        def _():
            o_ref[0] = compute(True)

    def halo_spec(off):
        def index_map(b, i, *_):
            return (b, jnp.clip(i * ratio + off, 0, n_hb - 1), 0)
        return pl.BlockSpec((1, hb, C), index_map)

    full = lambda b, i, *_: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=[
                halo_spec(-1),
                pl.BlockSpec((1, bt, C), lambda b, i, *_: (b, i, 0)),
                halo_spec(ratio),
                pl.BlockSpec((1, k1), full),
                pl.BlockSpec((1, k2), full),
                pl.BlockSpec((1, C), full),
                pl.BlockSpec((1, C), full),
            ],
            out_specs=pl.BlockSpec((1, bt, C), lambda b, i, *_: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, tp, C), x.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, x, x, fu, fd, a_vec, inv_vec)
    return out[:, :T]


def fused_activation1d(x, lengths, up_filter, alpha, beta, down_filter,
                       block_t: int = 160, interpret: bool = False):
    """Drop-in for models/vocoder.py activation1d (per-tensor 1-D filters).

    x: [B, T, C]; returns (y [B, T, C], lengths) — the upsample/downsample
    length arithmetic telescopes to the identity: up emits 2T (crop
    pad_left/pad_right eat the 2*pad replicate rows and the filter tail
    exactly), down's (2T + pl2 + pr2 - k2)//2 + 1 = T for even and odd k2.
    """
    a_vec = jnp.exp(alpha.astype(jnp.float32)).reshape(1, -1)
    inv_vec = (1.0 / (2.0 * (jnp.exp(beta.astype(jnp.float32)) + 1e-9))
               ).reshape(1, -1)
    fu = up_filter.astype(jnp.float32).reshape(1, -1)
    fd = down_filter.astype(jnp.float32).reshape(1, -1)
    y = _fused_call(x, lengths, fu, fd, a_vec, inv_vec,
                    int(fu.shape[1]), int(fd.shape[1]), block_t, interpret,
                    _ablate_mode(), _sincos_mode())
    return y, lengths
