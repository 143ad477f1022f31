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


def maybe_quant_matmul(x, w):
    """Dispatch helper: w is either a dense [K, N] array or a quantized leaf
    dict {"q": int8 [K, N], "s": f32 [K//32, N]} (kept quantized in HBM).
    x: [..., K] -> [..., N]. On non-TPU backends the leaf is dequantized in
    XLA (the Pallas kernel is TPU-only)."""
    if isinstance(w, dict):
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
