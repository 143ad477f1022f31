"""Pallas TPU kernel: same-length 1-D convolution as k shifted MXU matmuls.

XLA:TPU lowers the vocoder's dilated [C, C, k] resblock convs at ~4x the
matmul roofline at waveform lengths (measured 3.9 ms vs ~1 ms of MXU work
at [2, 245760, 128] k=3 — scripts/bench_vocoder_stages.py). Here the conv
is computed the MXU-native way: y[t] = sum_j x[t + (j - p/d)*d] @ W[j]
— k matmuls of [bt, Cin] x [Cin, Cout] over shifted static slices of a
haloed window, with the bias add, the optional residual add, and the
length mask fused into the same kernel (three more full-length XLA passes
gone). Zero-padding semantics at the true per-batch boundary come free
from the length-masking invariant (x is exactly 0 at t >= length) plus a
where() on the clamped halo rows (edge tiles only, pl.when).

Restrictions (the vocoder's case): stride 1, symmetric 'same' padding
p = d*(k-1)/2, x and residual [B, T, C].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=(
    "dilation", "block_t", "interpret", "has_bias", "has_residual"))
def _conv_call(x, lengths, w_kio, b, residual, dilation, block_t, interpret,
               has_bias, has_residual):
    B, T, C = x.shape
    k = w_kio.shape[0]
    cout = w_kio.shape[2]
    half = (k - 1) // 2 * dilation
    halo = max(half, 1)
    hb = max(32, ((halo + 31) // 32) * 32)
    bt = block_t
    while bt % hb:
        bt += hb - (bt % hb)
    tp = ((T + bt - 1) // bt) * bt
    if tp != T:
        pad = ((0, 0), (0, tp - T), (0, 0))
        x = jnp.pad(x, pad)
        if residual is not None:
            residual = jnp.pad(residual, pad)
    nt = tp // bt
    n_hb = tp // hb
    ratio = bt // hb

    def kernel(len_ref, *refs):
        i_ref = 0
        xl = refs[i_ref]; i_ref += 1
        xc = refs[i_ref]; i_ref += 1
        xr = refs[i_ref]; i_ref += 1
        w_ref = refs[i_ref]; i_ref += 1
        b_ref = None
        if has_bias:
            b_ref = refs[i_ref]; i_ref += 1
        r_ref = None
        if has_residual:
            r_ref = refs[i_ref]; i_ref += 1
        o_ref = refs[i_ref]
        b_idx = pl.program_id(0)
        i = pl.program_id(1)
        t0 = i * bt
        length = len_ref[b_idx]

        w = jnp.concatenate(
            [xl[0, hb - halo:, :], xc[0], xr[0, :halo, :]],
            axis=0).astype(jnp.float32)  # [halo + bt + halo, C]

        def compute(edges: bool):
            win = w
            if edges:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (halo + bt + halo, 1), 0)
                glob = t0 - halo + rows
                # zero-pad semantics: x is already 0 at t >= length (the
                # masking invariant); clamped halo rows below 0 / past the
                # padded end read junk and must be zeroed explicitly
                win = jnp.where((glob < 0) | (glob >= length), 0.0, w)
            acc = jnp.zeros((bt, cout), jnp.float32)
            for j in range(k):
                off = halo + (j - (k - 1) // 2) * dilation
                acc += jax.lax.dot_general(
                    win[off:off + bt, :], w_ref[j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if has_bias:
                acc += b_ref[0]
            if has_residual:
                acc += r_ref[0].astype(jnp.float32)
            if edges:
                tpos = t0 + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
                acc = jnp.where(tpos < length, acc, 0.0)
            return acc.astype(o_ref.dtype)

        interior = (t0 - halo >= 0) & (t0 + bt + halo <= length)

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

    full = lambda bb, ii, *_: (0, 0, 0)
    in_specs = [
        halo_spec(-1),
        pl.BlockSpec((1, bt, C), lambda bb, ii, *_: (bb, ii, 0)),
        halo_spec(ratio),
        pl.BlockSpec((k, C, cout), full),
    ]
    args = [x, x, x, w_kio]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, cout), lambda bb, ii, *_: (0, 0)))
        args.append(b.reshape(1, -1))
    if has_residual:
        in_specs.append(pl.BlockSpec((1, bt, cout),
                                     lambda bb, ii, *_: (bb, ii, 0)))
        args.append(residual)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bt, cout),
                                   lambda bb, ii, *_: (bb, ii, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, tp, cout), x.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), *args)
    return out[:, :T]


def conv1d_same_pallas(x, lengths, w, b=None, dilation: int = 1,
                       residual=None, block_t: int = 256,
                       interpret: bool = False):
    """Drop-in for mask_time(conv1d_zeropad(x, w, b, d, (k*d-d)//2)[+res], L).

    x: [B, T, Cin]; w: torch-layout [Cout, Cin, k] (odd k); returns
    [B, T, Cout] with rows at t >= length exactly 0."""
    k = int(w.shape[-1])
    assert k % 2 == 1, "same-conv kernel must be odd"
    w_kio = jnp.transpose(w, (2, 1, 0)).astype(jnp.float32)  # [k, Cin, Cout]
    return _conv_call(x, lengths, w_kio,
                      None if b is None else b.astype(jnp.float32),
                      residual, dilation, block_t, interpret,
                      b is not None, residual is not None)
