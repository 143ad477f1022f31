"""Normalization ops matching GGML semantics.

- ``layer_norm`` == ggml_norm + optional affine (miocodec-decoder.cpp:136-150):
  normalize over the feature (last) axis with eps inside the sqrt.
- ``masked_group_norm`` == ggml_group_norm over [W,1,C,B] with ne[2] as the
  channel axis (miocodec-decoder.cpp:1296-1301): statistics are taken over
  (channels-in-group x time); our version excludes padded time steps so a
  padded batch reproduces the reference's unpadded math exactly.
- ``adaln_modulate`` == AdaLN-Zero apply (miocodec-decoder.cpp:1183-1188):
  ``y = x_norm * (1 + scale) + shift``.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight=None, bias=None, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def adaln_modulate(x_norm: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x_norm [B,T,C], shift/scale [B,C] (or broadcastable)."""
    return x_norm * (1.0 + scale[:, None, :]) + shift[:, None, :]


def masked_group_norm(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over [B, T, C] with stats per (batch, group) over valid
    (time x channels-in-group); no affine (applied separately per channel)."""
    B, T, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    cg = C // num_groups
    xf = x.astype(jnp.float32).reshape(B, T, num_groups, cg)
    mask = (jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None]).astype(jnp.float32)
    m = mask[:, :, None, None]
    count = jnp.maximum(lengths.astype(jnp.float32) * cg, 1.0)[:, None, None, None]
    mean = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / count
    var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True) / count
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * m  # keep padded region zero
    return y.reshape(B, T, C).astype(x.dtype)
