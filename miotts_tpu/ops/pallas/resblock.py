"""Fused vocoder resblock layer: actA -> conv1(dilated) -> actB -> conv2
+ residual in ONE Pallas kernel.

The AMP resblock layer (models/vocoder.py vocoder_decode, mirroring
miocodec-decoder.cpp:2064-2079) chains four full-length ops; as separate
kernels each pays a [B, T, C] HBM write + read between stages. The
measured in-context split of the mel-vocoder forward is ~56% Activation1d
+ ~22% resblock convs (scripts/bench_vocoder_ablate.py), with roughly a
third of the act kernel being pure memory traffic — fusing the layer
removes three intermediate round trips of the waveform-length tensor and
feeds the convs' MXU matmuls from VMEM.

Margins telescope statically: conv2 (k2c taps, dil 1) needs actB rows
+-half2; actB needs conv1 rows +-(h_loB/h_hiB); conv1 (k1c taps, dil d)
needs actA rows +-half1; actA needs input rows +-(h_loA/h_hiA). Total
halo <= 32 for every production geometry (k_filter <= 24, dil <= 5,
k_conv = 3), so one 32-row halo block per side feeds the whole chain.

Edge semantics (replicate-pad at the per-batch data boundaries, prev=0 at
the stream start, zero conv padding, masked outputs) run only on boundary
tiles via the act1d kernel's pattern: interior tiles take a branch-free
compute(False) path; edge tiles re-derive every stage's global positions
and apply the masked-select/masked-sum edge apparatus per stage.
Measured parity vs the unfused chain: tests/test_resblock_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activation1d import _geometry, fast_cos, fast_sin


def _snake(xv, pv, a, inv, interpret: bool):
    """ADAA snake-beta on a phase buffer (see activation1d.py)."""
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
    sin_ad = fast_sin(ad)
    cos_as = fast_cos(a * s_)
    sinc = jnp.where(tiny, 1.0, sin_ad * r)
    return s_ * 0.5 + inv * (1.0 - cos_as * sinc)


def _masked_row(cond_rows, buf):
    """Extract the single row of ``buf`` where cond_rows holds (masked
    sum: each global index appears in exactly one row)."""
    return jnp.sum(jnp.where(cond_rows, buf, 0.0), axis=0, keepdims=True)


def _act_rows(wbuf, off: int, n: int, fu_ref, fd_ref, a, inv, g, C: int,
              interpret: bool, edge=None, first_row: int | None = None):
    """Anti-aliased snake outputs for rows [off, off+n) of ``wbuf``.

    ``edge=None``: branch-free interior compute (no pads in range).
    ``edge=(glob0, length)``: full replicate-pad semantics — glob0 is the
    global time index of wbuf row 0; ``first_row`` the wbuf row holding
    global index 0 IF this tile can read below 0 (static, act1d pattern:
    only the t0==0 tile reads below 0, and there the row is known
    statically). Outputs at global <0 or >= length are zeroed (composite:
    conv zero-pad below 0; mask_time past length)."""
    nw = wbuf.shape[0]
    if edge is not None:
        glob0, length = edge
        rows = jax.lax.broadcasted_iota(jnp.int32, (nw, 1), 0)
        glob = glob0 + rows
        x_first = (wbuf[first_row:first_row + 1, :]
                   if first_row is not None else jnp.zeros((1, C)))
        x_edge = _masked_row(glob == length - 1, wbuf)
        wbuf = jnp.where(glob < 0, x_first,
                         jnp.where(glob >= length, x_edge, wbuf))
    gz = g["g_lo"] + 1 + n + g["g_hi"]
    base_e = off - (g["g_lo"] + 1) + g["a_e"]
    base_o = off - (g["g_lo"] + 1) + g["a_o"]
    up_e = jnp.zeros((gz, C), jnp.float32)
    up_o = jnp.zeros((gz, C), jnp.float32)
    for r in range(g["n_e"]):
        up_e += fu_ref[0, 2 * r + g["p0"]] * wbuf[base_e - r:base_e - r + gz, :]
    for r in range(g["n_o"]):
        up_o += fu_ref[0, 2 * r + g["p1"]] * wbuf[base_o - r:base_o - r + gz, :]
    up_e *= 2.0
    up_o *= 2.0
    if edge is not None:
        # z buffer row s holds 2x-sample pair at input-global zg0 + s
        zg0 = glob0 + off - g["g_lo"]
        s_glob = zg0 + jax.lax.broadcasted_iota(jnp.int32, (gz - 1, 1), 0)
        # prev of 2x-sample 0 is 0 (the reference zero-pads there)
        prev_e = jnp.where(s_glob == 0, 0.0, up_o[:gz - 1, :])
    else:
        prev_e = up_o[:gz - 1, :]
    z_e = _snake(up_e[1:, :], prev_e, a, inv, interpret)
    z_o = _snake(up_o[1:, :], up_e[1:, :], a, inv, interpret)
    if edge is not None:
        # replicate-extend z at the 2x-rate edges for the downsample pad
        z_first = _masked_row(s_glob == 0, z_e)
        z_edge = _masked_row(s_glob == length - 1, z_o)
        z_e = jnp.where(s_glob < 0, z_first,
                        jnp.where(s_glob >= length, z_edge, z_e))
        z_o = jnp.where(s_glob < 0, z_first,
                        jnp.where(s_glob >= length, z_edge, z_o))
    out = jnp.zeros((n, C), jnp.float32)
    for ph, s_off, j in g["taps"]:
        buf = z_e if ph == "e" else z_o
        sl = g["g_lo"] + s_off
        out += fd_ref[0, j] * buf[sl:sl + n, :]
    if edge is not None:
        og = glob0 + off + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        # rows past `length` are masked like the composite; rows below 0
        # are zeroed so the next conv sees zero padding
        out = jnp.where((og >= 0) & (og < length), out, 0.0)
    return out


def _conv_rows(rbuf, off: int, n: int, w_ref, b_ref, k: int, dil: int):
    """k-tap dilated conv rows [off, off+n) of rbuf via shifted matmuls."""
    half = (k - 1) // 2
    acc = jnp.zeros((n, w_ref.shape[2]), jnp.float32)
    for j in range(k):
        s = off + (j - half) * dil
        acc += jax.lax.dot_general(
            rbuf[s:s + n, :], w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc + b_ref[0]


@functools.partial(jax.jit, static_argnames=(
    "k1A", "k2A", "k1c", "dil", "k1B", "k2B", "k2c", "block_t", "interpret"))
def _resblock_call(x, lengths, fuA, fdA, aA, invA, w1, b1, fuB, fdB, aB,
                   invB, w2, b2, k1A, k2A, k1c, dil, k1B, k2B, k2c, block_t,
                   interpret):
    B, T, C = x.shape
    gA = _geometry(k1A, k2A)
    gB = _geometry(k1B, k2B)
    half1 = (k1c - 1) // 2 * dil
    half2 = (k2c - 1) // 2
    halo = max(half2 + gB["h_lo"] + half1 + gA["h_lo"],
               half2 + gB["h_hi"] + half1 + gA["h_hi"], 1)
    hb = max(32, ((halo + 31) // 32) * 32)
    bt = block_t
    while bt % hb:
        bt += hb - (bt % hb)
    # static row margins, outermost first
    nB_out = bt + 2 * half2                           # actB rows needed
    nB_in = nB_out + gB["h_lo"] + gB["h_hi"]          # conv1 rows needed
    nA_out = nB_in + 2 * half1                        # actA rows needed
    tp = ((T + bt - 1) // bt) * bt
    if tp != T:
        x = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))
    nt = tp // bt
    n_hb = tp // hb
    ratio = bt // hb
    offA = hb - (half2 + gB["h_lo"] + half1)  # actA's first row in w

    def kernel(len_ref, xl, xc, xr, fuA_r, fdA_r, aA_r, invA_r, w1_r, b1_r,
               fuB_r, fdB_r, aB_r, invB_r, w2_r, b2_r, o_ref):
        b_idx = pl.program_id(0)
        t0 = pl.program_id(1) * bt
        length = len_ref[b_idx]
        w = jnp.concatenate([xl[0], xc[0], xr[0]],
                            axis=0).astype(jnp.float32)  # [hb+bt+hb, C]
        aA = aA_r[0:1, :]
        iA = invA_r[0:1, :]
        aB = aB_r[0:1, :]
        iB = invB_r[0:1, :]

        def compute(edges: bool):
            glob0 = t0 - hb  # global index of w row 0
            eA = (glob0, length) if edges else None
            r1 = _act_rows(w, offA, nA_out, fuA_r, fdA_r, aA, iA, gA, C,
                           interpret, edge=eA,
                           first_row=hb if edges else None)
            # conv1: consumes r1 with +-half1 margin. Zero-pad semantics
            # come free: r1 is exactly 0 outside [0, length) in edge mode.
            r2 = _conv_rows(r1, half1, nB_in, w1_r, b1_r, k1c, dil)
            # actB: consumes r2 with h_loB/h_hiB margin. r2 row 0 is at
            # global t0 - (half2 + h_loB); the only tile reading r2 below
            # global 0 is t0 == 0, where global 0 is r2 row half2 + h_loB.
            eB = ((t0 - (half2 + gB["h_lo"]), length) if edges else None)
            r3 = _act_rows(r2, gB["h_lo"], nB_out, fuB_r, fdB_r, aB, iB,
                           gB, C, interpret, edge=eB,
                           first_row=(half2 + gB["h_lo"]) if edges else None)
            out = _conv_rows(r3, half2, bt, w2_r, b2_r, k2c, 1)
            out = out + w[hb:hb + bt, :]
            if edges:
                tpos = t0 + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
                out = jnp.where(tpos < length, out, 0.0)
            return out.astype(o_ref.dtype)

        interior = (t0 - hb >= 0) & (t0 + bt + hb <= length)

        @pl.when(interior)
        def _():
            o_ref[0] = compute(False)

        @pl.when(jnp.logical_not(interior))
        def _():
            o_ref[0] = compute(True)

    def halo_spec(off):
        def index_map(bb, ii, *_):
            return (bb, jnp.clip(ii * ratio + off, 0, n_hb - 1), 0)
        return pl.BlockSpec((1, hb, C), index_map)

    full2 = lambda bb, ii, *_: (0, 0)  # noqa: E731
    full3 = lambda bb, ii, *_: (0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=[
                halo_spec(-1),
                pl.BlockSpec((1, bt, C), lambda bb, ii, *_: (bb, ii, 0)),
                halo_spec(ratio),
                pl.BlockSpec((1, k1A), full2),
                pl.BlockSpec((1, k2A), full2),
                pl.BlockSpec((1, C), full2),
                pl.BlockSpec((1, C), full2),
                pl.BlockSpec((k1c, C, C), full3),
                pl.BlockSpec((1, C), full2),
                pl.BlockSpec((1, k1B), full2),
                pl.BlockSpec((1, k2B), full2),
                pl.BlockSpec((1, C), full2),
                pl.BlockSpec((1, C), full2),
                pl.BlockSpec((k2c, C, C), full3),
                pl.BlockSpec((1, C), full2),
            ],
            out_specs=pl.BlockSpec((1, bt, C), lambda bb, ii, *_: (bb, ii, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, tp, C), x.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, x, x, fuA, fdA, aA, invA, w1, b1,
      fuB, fdB, aB, invB, w2, b2)
    return out[:, :T]


def fused_resblock_layer(x, lengths, actA, w1, b1, dilation, actB, w2, b2,
                         composite_fn=None, block_t: int = 160,
                         interpret: bool = False):
    """One resblock layer conv2(actB(conv1(actA(x)))) + x, fused, with
    full edge semantics in-kernel (``composite_fn`` is accepted for
    call-site compatibility but no longer used)."""
    del composite_fn

    def prep(f):
        return f.astype(jnp.float32).reshape(1, -1)

    def act_params(act):
        a_vec = jnp.exp(act["alpha"].astype(jnp.float32)).reshape(1, -1)
        inv_vec = (1.0 / (2.0 * (jnp.exp(act["beta"].astype(jnp.float32))
                                 + 1e-9))).reshape(1, -1)
        return (prep(act["up_filter"]), prep(act["down_filter"]),
                a_vec, inv_vec)

    fuA, fdA, aA, invA = act_params(actA)
    fuB, fdB, aB, invB = act_params(actB)
    w1_kio = jnp.transpose(w1, (2, 1, 0)).astype(jnp.float32)  # [k, Cin, Co]
    w2_kio = jnp.transpose(w2, (2, 1, 0)).astype(jnp.float32)
    return _resblock_call(
        x, lengths, fuA, fdA, aA, invA, w1_kio, b1.reshape(1, -1),
        fuB, fdB, aB, invB, w2_kio, b2.reshape(1, -1),
        int(fuA.shape[1]), int(fdA.shape[1]), int(w1_kio.shape[0]),
        int(dilation), int(fuB.shape[1]), int(fdB.shape[1]),
        int(w2_kio.shape[0]), block_t, interpret)
