"""Pallas TPU kernel for banded (local-window) attention.

The codec transformers attend within |k - q| <= window//2 (window 65,
miocodec-decoder.h:25,30). The reference materializes a dense [n, n] mask
(miocodec-decoder.cpp:1142-1148); this kernel tiles queries into BQ blocks
and reads only the previous/current/next key blocks (clamped index maps —
pure BlockSpec pipelining, no manual DMA), so work and memory are
O(T * 3*BQ) and no [T, T] tensor exists anywhere.

Layout: q/k/v [BH, T, D] (batch x heads folded), lengths [BH] via scalar
prefetch. Requires window//2 <= block_q. Scores/softmax in f32
(GGML_PREC_F32 parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lengths_ref, q_ref, kp_ref, kc_ref, kn_ref, vp_ref, vc_ref, vn_ref,
            o_ref, *, half: int, block_q: int, scale: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    q0 = i * block_q
    length = lengths_ref[b]

    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k3 = jnp.concatenate(
        [kp_ref[0], kc_ref[0], kn_ref[0]], axis=0).astype(jnp.float32)  # [3BQ, D]
    v3 = jnp.concatenate(
        [vp_ref[0], vc_ref[0], vn_ref[0]], axis=0).astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k3, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, 3BQ]

    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, 3 * block_q), 0)
    # absolute key positions: tile 0 = block i-1, tile 1 = block i, tile 2 = i+1.
    # Edge blocks duplicated by the clamped index maps land on negative or
    # >= length positions and are masked out by `valid` automatically.
    rel = jax.lax.broadcasted_iota(jnp.int32, (block_q, 3 * block_q), 1)
    k_pos = (i - 1) * block_q + rel
    band = jnp.abs(k_pos - q_pos) <= half
    valid = (k_pos >= 0) & (k_pos < length)
    allow = (band & valid) | (k_pos == q_pos)
    scores = jnp.where(allow, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p, v3, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "block_q", "interpret"))
def banded_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    window: int,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: [BH, T, D]; T is padded to a multiple of block_q internally."""
    BH, T, D = q.shape
    half = max(0, window // 2)
    assert half <= block_q, (half, block_q)
    Tp = ((T + block_q - 1) // block_q) * block_q
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    nb = Tp // block_q
    scale = 1.0 / np.sqrt(D)

    def spec(offset):
        def index_map(b, i, *_):
            if offset < 0:
                return (b, jnp.maximum(i - 1, 0), 0)
            if offset > 0:
                return (b, jnp.minimum(i + 1, nb - 1), 0)
            return (b, i, 0)
        return pl.BlockSpec((1, block_q, D), index_map)

    kernel = functools.partial(_kernel, half=half, block_q=block_q, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, nb),
            in_specs=[spec(0), spec(-1), spec(0), spec(1),
                      spec(-1), spec(0), spec(1)],
            out_specs=spec(0),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, k, k, v, v, v)
    return out[:, :T]
