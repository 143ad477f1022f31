"""Rotary position embedding, GGML "NORM" (mode 0) convention.

Matches ``ggml_rope_ext(q, pos, n_dims=head_dim, mode=0, theta, 1.0, 0.0,
1.0, 32.0, 1.0)`` as used by the codec transformers
(miocodec-decoder.cpp:1223-1224): adjacent-pair rotation — pairs
(x[2i], x[2i+1]) rotated by angle ``pos * theta_base^(-2i/head_dim)``;
ext_factor=0 so no YaRN correction, freq_scale=1, attn_factor=1.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, head_dim: int, theta_base: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [..., head_dim//2] for given positions [...]."""
    half = head_dim // 2
    exponents = jnp.arange(half, dtype=jnp.float32) * (-2.0 / head_dim)
    inv_freq = jnp.power(jnp.float32(theta_base), exponents)  # theta^(-2i/d)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               theta_base: float = 10000.0, neox: bool = False) -> jnp.ndarray:
    """x: [B, T, H, D] (D even), positions: [T] or [B, T].

    neox=False: GGML mode-0 adjacent-pair rotation (pairs (x[2i], x[2i+1]));
    neox=True: half-split rotation (pairs (x[i], x[i+D/2]) — llama.cpp NEOX,
    used by the Qwen-family LLM)."""
    B, T, H, D = x.shape
    cos, sin = rope_angles(positions, D, theta_base)  # [T, D/2] or [B, T, D/2]
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    if neox:
        x0, x1 = xf[..., : D // 2], xf[..., D // 2:]
        y = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    else:
        xp = xf.reshape(B, T, H, D // 2, 2)
        y0 = xp[..., 0] * cos - xp[..., 1] * sin
        y1 = xp[..., 0] * sin + xp[..., 1] * cos
        y = jnp.stack([y0, y1], axis=-1).reshape(B, T, H, D)
    return y.astype(x.dtype)
