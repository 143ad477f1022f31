"""Pallas TPU kernel for banded (local-window) attention.

The codec transformers attend within |k - q| <= window//2 (window 65,
miocodec-decoder.h:25,30). The reference materializes a dense [n, n] mask
(miocodec-decoder.cpp:1142-1148); this kernel tiles queries into BQ blocks
and reads exactly the key halo the band needs: keys arrive as KB-wide
blocks (KB = the 32-aligned half-window), block_q//KB + 2 of them per query
block, so the scored window is block_q + 2*KB wide — e.g. 128 for
(block_q=64, window=65) vs the 192-wide gather of the blocked-XLA path and
the 3*block_q concat of the first kernel revision. Clamped index maps keep
it pure BlockSpec pipelining (no manual DMA: the remote AOT helper crashes
on make_async_copy); edge blocks alias their neighbors and are masked by
position. Work and memory are O(T * (block_q + 2*KB)) and no [T, T] tensor
exists anywhere.

Layout: q/k/v [BH, T, D] (batch x heads folded into the grid), lengths [BH]
via scalar prefetch. Scores/softmax in f32 (GGML_PREC_F32 parity,
miocodec-decoder.cpp:1252).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("window", "block_q", "interpret"))
def banded_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    window: int,
    block_q: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: [BH, T, D]; T is padded to a multiple of block_q internally."""
    BH, T, D = q.shape
    half = max(0, window // 2)
    # key halo granularity: 32-aligned (f32 sublane-friendly) cover of half
    kb = max(32, ((half + 31) // 32) * 32)
    if block_q % kb:
        block_q = ((block_q + kb - 1) // kb) * kb
    n_inner = block_q // kb
    n_kb = n_inner + 2  # one halo block each side
    Tp = ((T + block_q - 1) // block_q) * block_q
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    nb = Tp // block_q
    nkb_total = Tp // kb
    W = n_kb * kb
    scale = 1.0 / np.sqrt(D)

    def kernel(lengths_ref, *refs):
        q_ref = refs[0]
        k_refs = refs[1:1 + n_kb]
        v_refs = refs[1 + n_kb:1 + 2 * n_kb]
        o_ref = refs[1 + 2 * n_kb]
        b = pl.program_id(0)
        i = pl.program_id(1)
        q0 = i * block_q
        length = lengths_ref[b]

        qf = q_ref[0].astype(jnp.float32)  # [BQ, D]
        kw = jnp.concatenate([r[0] for r in k_refs], axis=0).astype(jnp.float32)
        vw = jnp.concatenate([r[0] for r in v_refs], axis=0).astype(jnp.float32)

        scores = jax.lax.dot_general(
            qf, kw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, W]

        q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, W), 0)
        # absolute key positions: the window starts one halo block early.
        # Edge blocks duplicated by the clamped index maps land on negative
        # or >= length positions and are masked out automatically.
        k_pos = (q0 - kb) + jax.lax.broadcasted_iota(jnp.int32, (block_q, W), 1)
        band = jnp.abs(k_pos - q_pos) <= half
        valid = (k_pos >= 0) & (k_pos < length)
        allow = (band & valid) | (k_pos == q_pos)
        scores = jnp.where(allow, scores, -jnp.inf)

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0] = jax.lax.dot_general(
            p, vw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    q_spec = pl.BlockSpec((1, block_q, D), lambda b, i, *_: (b, i, 0))

    def kv_spec(off):
        def index_map(b, i, *_):
            j = i * n_inner + off
            return (b, jnp.clip(j, 0, nkb_total - 1), 0)
        return pl.BlockSpec((1, kb, D), index_map)

    kv_specs = [kv_spec(off) for off in range(-1, n_inner + 1)]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, nb),
            in_specs=[q_spec] + kv_specs + kv_specs,
            out_specs=q_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, *([k] * n_kb), *([v] * n_kb))
    return out[:, :T]
