"""Pallas TPU kernel: activation-bf16 x weight-int8 (Q8_0 blocks) matmul.

The MioTTS LLM ships Q8_0 (32-wide blocks of int8 with an f16 scale).
Keeping weights quantized in HBM and dequantizing inside the matmul tile
halves the weight traffic of the HBM-bound decode step vs bf16 weights
(~1.06 bytes/param streamed instead of 2).

Layout: x [T, K] bf16/f32, wq [K, N] int8 (transposed from the GGUF [N, K]
so blocks run down the contraction dim), scales [K//32, N] f32.
y[t, n] = sum_k x[t, k] * wq[k, n] * scales[k//32, n].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 32  # Q8_0 block size along the contraction dim


def _kernel(x_ref, wq_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.bfloat16)  # [T, BK]
    wq = wq_ref[...].astype(jnp.float32)  # [BK, BN]
    s = s_ref[...]  # [BK//32, BN] f32
    bk, bn = wq.shape
    # per-element repeat of each scale row over its 32-wide block
    s_full = jnp.broadcast_to(s[:, None, :], (bk // QBLOCK, QBLOCK, bn)).reshape(bk, bn)
    w = (wq * s_full).astype(jnp.bfloat16)  # bf16 MXU dot, f32 accumulate
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "interpret"))
def q8_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scales: jnp.ndarray,
    block_k: int = 1024,
    block_n: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [T, K] @ dequant(wq [K, N], scales [K//32, N]) -> [T, K->N] f32."""
    T, K = x.shape
    K2, N = wq.shape
    assert K == K2 and scales.shape == (K // QBLOCK, N), (x.shape, wq.shape, scales.shape)

    def pick(total: int, want: int, quantum: int) -> int:
        if total <= quantum or total % quantum != 0:
            return total  # full dim (always a legal Pallas block)
        b = min(want, total)
        b -= b % quantum
        while b > quantum and total % b != 0:
            b -= quantum
        assert total % b == 0 and b % quantum == 0, (total, b, quantum)
        return b

    # bk must be a multiple of 8*QBLOCK so the scales tile [bk/32, bn] keeps
    # a sublane-aligned (divisible-by-8) leading dim
    bk = pick(K, block_k, 8 * QBLOCK)
    bn = pick(N, block_n, 128)
    n_k = K // bk
    grid = (N // bn, n_k)

    kernel = functools.partial(_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((bk // QBLOCK, bn), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((T, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, bn), jnp.float32)],
        interpret=interpret,
    )(x, wq, scales)


def quantize_q8_cols(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quantize a [K, N] float weight to Q8_0-style blocks along K.
    Returns (wq int8 [K, N], scales f32 [K//32, N])."""
    K, N = w.shape
    assert K % QBLOCK == 0
    blocks = w.reshape(K // QBLOCK, QBLOCK, N).astype(np.float32)
    amax = np.abs(blocks).max(axis=1)  # [K/32, N]
    d = (amax / 127.0).astype(np.float16).astype(np.float32)  # f16 scale like Q8_0
    q = np.round(blocks / np.where(d == 0, 1, d)[:, None, :]).astype(np.int8)
    return q.reshape(K, N), d


def dequant_dense(w: dict) -> jnp.ndarray:
    """Expand a quantized leaf to a dense f32 [K, N] matrix (XLA fallback)."""
    return w["q"].astype(jnp.float32) * jnp.repeat(w["s"], QBLOCK, axis=0)


# ---------------------------------------------------------------------------
# W8A8: per-output-channel int8 weights x dynamically quantized activations.
# The scale is constant along the contraction dim, so it factors out of the
# dot and the MXU runs a native int8 x int8 -> int32 matmul: 2x the bf16
# throughput on v5e (394 vs 197 TOPS) and half the weight HBM traffic —
# the decode step is weight-bandwidth-bound, so this is the speed-of-light
# path. Accuracy trade: per-column weight scale (vs Q8_0's per-32-block) and
# ~7-bit activations; opt in via MIOTTS_LLM_QUANT=int8.
# ---------------------------------------------------------------------------

def quantize_int8_percol(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quantize a [K, N] float weight per output column.
    Returns (q8 int8 [K, N], s8 f32 [N]) with w ~= q8 * s8[None, :]."""
    amax = np.abs(w).max(axis=0)
    s = (amax / 127.0).astype(np.float32)
    q = np.round(w / np.where(s == 0, 1, s)[None, :])
    return np.clip(q, -127, 127).astype(np.int8), s


def int8_matmul(x: jnp.ndarray, q8: jnp.ndarray, s8: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ (q8 [K, N] * s8 [N]) with dynamic per-row activation
    quantization; returns f32 [..., N]. Pure XLA — the int8 dot lowers to
    native MXU int8 on TPU and plain integer dots elsewhere."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    x8 = jnp.round(x2 / sx).astype(jnp.int8)
    y = jax.lax.dot_general(x8, q8, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * s8[None, :]
    return y.reshape(*lead, -1)


def quantize_int4_percol(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quantize a [K, N] float weight per output column to 4-bit symmetric
    ([-7, 7]). Returns (q4 stored AS INT8 [K, N], s4 f32 [N]) — int4 arrays
    can't ride every PJRT transport (the axon relay raises UNIMPLEMENTED on
    int4 transfers), so the leaf ships as int8 and the decode loops convert
    to jnp.int4 ON device, once per jitted call (llm._prepare_decode_weights)."""
    amax = np.abs(w).max(axis=0)
    s = (amax / 7.0).astype(np.float32)
    q = np.round(w / np.where(s == 0, 1, s)[None, :])
    return np.clip(q, -7, 7).astype(np.int8), s


def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, s4: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ (q4 [K, N] * s4 [N]) with dynamic per-row int8 activation
    quantization; returns f32 [..., N]. q4 may be jnp.int4 (the in-graph
    converted form — XLA:TPU streams the packed 0.5 B/param from HBM, the
    measured speed-of-light head) or int8 storage (astype int8 is then a
    no-op): both run the native MXU integer dot, identical math to
    int8_matmul after the widening cast."""
    return int8_matmul(x, q4.astype(jnp.int8), s4)


def maybe_quant_matmul(x, w):
    """Dispatch helper: w is a dense [K, N] array or a quantized leaf dict —
    {"q": int8 [K, N], "s": f32 [K//32, N]} for Q8_0 blocks (Pallas dequant
    kernel, TPU-only), {"q8": int8 [K, N], "s8": f32 [N]} for W8A8
    per-channel int8 (native MXU int8 dot, any backend), or
    {"q4"/"q4i8": int4-or-int8 [K, N], "s4": f32 [N]} for the W4A8 head.
    x: [..., K] -> [..., N]."""
    if isinstance(w, dict):
        if "q4" in w or "q4i8" in w:
            q = w["q4"] if "q4" in w else w["q4i8"]
            return int4_matmul(x, q, w["s4"]).astype(x.dtype)
        if "q8" in w:
            return int8_matmul(x, w["q8"], w["s8"]).astype(x.dtype)
        if jax.default_backend() != "tpu":
            return (x @ dequant_dense(w).astype(x.dtype)).astype(x.dtype)
        lead = x.shape[:-1]
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        # pad rows to the bf16 sublane quantum
        T = x2.shape[0]
        Tp = max(16, ((T + 15) // 16) * 16)
        if Tp != T:
            x2 = jnp.pad(x2, ((0, Tp - T), (0, 0)))
        y = q8_matmul(x2, w["q"], w["s"])[:T]
        return y.reshape(*lead, -1).astype(x.dtype)
    return x @ w
