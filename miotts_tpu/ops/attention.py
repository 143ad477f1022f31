"""Banded (local-window) multi-head attention.

The codec transformers use symmetric local attention with window 65
(|k - q| <= 32): the reference materializes a dense [n, n] additive mask
(miocodec-decoder.cpp:1142-1148,1501-1525) and runs full attention. Here the
band + length masks are fused into one masked softmax in f32 (matching
GGML_PREC_F32 accumulation, :1252); a Pallas block-banded kernel that never
materializes the [n, n] score matrix is provided in ops/pallas for long
sequences.
"""

from __future__ import annotations

import jax.numpy as jnp


def band_length_mask(seq: int, window: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, seq, seq] boolean: allow iff |k - q| <= window//2 and k < length,
    with the diagonal always allowed so padded query rows stay finite."""
    half = max(0, window // 2)
    q = jnp.arange(seq, dtype=jnp.int32)
    band = jnp.abs(q[:, None] - q[None, :]) <= half  # [q, k]
    valid_k = q[None, :] < lengths[:, None]  # [B, k]
    allow = band[None, :, :] & valid_k[:, None, :]
    diag = jnp.eye(seq, dtype=bool)[None]
    return allow | diag


def banded_attention_dense(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    window: int,
) -> jnp.ndarray:
    """Reference-shaped dense path (materializes [T, T] scores like the
    GGML graph). q/k/v: [B, T, H, D]; f32 scores/softmax."""
    B, T, H, D = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    allow = band_length_mask(T, window, lengths)[:, None, :, :]
    scores = jnp.where(allow, scores, -jnp.inf)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def banded_attention_blocked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    window: int,
    block_q: int = 128,
) -> jnp.ndarray:
    """Windowed-gather banded attention: O(T * (block+2*halo)) memory.

    Queries are tiled into blocks; each block attends to a key slice
    [i*block - halo, i*block + block + halo) gathered with a halo pad —
    no [T, T] tensor is ever materialized. Exactly equals the dense path."""
    B, T, H, D = q.shape
    half = max(0, window // 2)
    Tp = ((T + block_q - 1) // block_q) * block_q
    if Tp != T:
        pad = Tp - T
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nb = Tp // block_q
    W = block_q + 2 * half
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    # halo-pad keys/values so every block's window is a static slice
    kp = jnp.pad(k, ((0, 0), (half, half), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (half, half), (0, 0), (0, 0)))
    # windows[i] = kp[:, i*block : i*block + W] -> [B, nb, W, H, D]
    idx = (jnp.arange(nb)[:, None] * block_q + jnp.arange(W)[None, :])  # [nb, W]
    kw = kp[:, idx]  # [B, nb, W, H, D]
    vw = vp[:, idx]
    qb = q.reshape(B, nb, block_q, H, D)

    scores = jnp.einsum("bnqhd,bnkhd->bnhqk", qb.astype(jnp.float32),
                        kw.astype(jnp.float32)) * scale
    q_pos = (jnp.arange(nb)[:, None] * block_q + jnp.arange(block_q)[None, :])  # [nb, BQ]
    k_pos = idx - half  # absolute key positions, [nb, W]
    band = jnp.abs(k_pos[:, None, :] - q_pos[:, :, None]) <= half  # [nb, BQ, W]
    valid = ((k_pos[None, :, None, :] < lengths[:, None, None, None])
             & (k_pos[None, :, None, :] >= 0))  # [B, nb, 1, W]
    diag = k_pos[:, None, :] == q_pos[:, :, None]
    allow = (band[None] & valid) | diag[None]
    scores = jnp.where(allow[:, :, None], scores, -jnp.inf)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs, vw.astype(jnp.float32))
    out = out.reshape(B, Tp, H, D)[:, :T]
    return out.astype(q.dtype)


# dispatch threshold: below this T the dense path is cheaper than gathers
_DENSE_MAX_T = 256
# the Pallas kernel wins from this T up on TPU (scripts/bench_attention.py,
# v5e, B=8 H=12 D=64 window=65: 256 -> 9.9 ms vs 12.9 dense / 13.1 blocked;
# 1024 -> 37.7 vs 76.4 blocked; 2048 -> 60.6 vs 164.2)
_PALLAS_MIN_T = 192


def _pallas_banded(q, k, v, lengths, window):
    from .pallas.banded_attention import banded_attention_pallas

    B, T, H, D = q.shape
    # wider q-blocks amortize grid steps at short T; narrower ones cut the
    # wasted band flops once T is large (measured crossover ~512)
    block_q = 128 if T <= 384 else 64
    fold = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, T, D)
    lens = jnp.repeat(lengths.astype(jnp.int32), H)
    out = banded_attention_pallas(fold(q), fold(k), fold(v), lens, window,
                                  block_q=block_q)
    return jnp.transpose(out.reshape(B, H, T, D), (0, 2, 1, 3))


def _pallas_available() -> bool:
    import jax

    # a jax.default_device(cpu) context (e.g. the fidelity bench's CPU-f32
    # reference decode) must not select the TPU-only kernel — the config'd
    # default device wins over the process default backend
    dd = jax.config.jax_default_device
    if dd is not None:
        platform = getattr(dd, "platform", str(dd))
        return str(platform).lower() == "tpu"
    return jax.default_backend() == "tpu"


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    window: int,
    impl: str | None = None,
) -> jnp.ndarray:
    """q/k/v: [B, T, H, D] (post-RoPE). Returns [B, T, H, D].

    Dispatch (overridable with MIOTTS_ATTN_IMPL=dense|blocked|pallas, or the
    explicit ``impl`` argument, which wins — sequence-parallel decodes pin
    "blocked": a pallas_call is an opaque custom call GSPMD cannot
    partition, while the blocked halo-gather lowers to sharded ops): on
    TPU the Pallas block-banded kernel from _PALLAS_MIN_T up (fastest at
    every measured production length), dense below it, windowed-blocked as
    the non-TPU long-sequence fallback (O(T*window) instead of O(T^2)).
    Scores/softmax in f32."""
    import os

    if impl is None:
        impl = os.environ.get("MIOTTS_ATTN_IMPL", "auto")
    T = q.shape[1]
    half = max(0, window // 2)
    if impl == "dense":
        return banded_attention_dense(q, k, v, lengths, window)
    if impl == "blocked":
        return banded_attention_blocked(q, k, v, lengths, window)
    pallas_ok = half <= 128 and T > max(window, _PALLAS_MIN_T)
    if impl == "pallas" and pallas_ok:
        return _pallas_banded(q, k, v, lengths, window)
    if impl == "auto" and pallas_ok and _pallas_available():
        return _pallas_banded(q, k, v, lengths, window)
    if T <= _DENSE_MAX_T or T <= window:
        return banded_attention_dense(q, k, v, lengths, window)
    return banded_attention_blocked(q, k, v, lengths, window)
