"""Length-mask helpers for padded, length-bucketed batches."""

from __future__ import annotations

import jax.numpy as jnp


def time_mask(max_len: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, max_len] boolean mask, True for valid positions t < lengths[b]."""
    t = jnp.arange(max_len, dtype=jnp.int32)
    return t[None, :] < lengths[:, None]


def mask_time(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded time steps of [B, T, ...]. Keeps the invariant that
    everything at t >= lengths[b] is exactly zero, so same-padded convs at the
    true sequence boundary see the same zeros as an unpadded run."""
    mask = time_mask(x.shape[1], lengths)
    return x * mask.reshape(mask.shape + (1,) * (x.ndim - 2)).astype(x.dtype)
