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


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    window: int,
) -> jnp.ndarray:
    """q/k/v: [B, T, H, D] (post-RoPE). Returns [B, T, H, D].

    Scores are computed and softmaxed in float32 (GGML_PREC_F32 parity)."""
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
