"""1-D convolution ops in [B, T, C] layout with torch-convention weights.

Semantics match the GGML ops used by the reference decode graph:
- ``conv1d_same`` == ggml_conv_1d_ph (pad = k//2, miocodec-decoder.cpp:1312)
- ``conv1d_depthwise_same`` == ggml_conv_1d_dw_ph (:888)
- ``conv_transpose1d`` == ggml_conv_transpose_1d stride s, pad 0 (:1370,1421)
- ``linear_interpolate`` == ggml_interpolate BILINEAR (:1373) along time with
  half-pixel sampling (align_corners=False), generalized to *dynamic* true
  source/target lengths so padded length-buckets reproduce the exact
  unpadded scale factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NWC", "WIO", "NWC")


def conv1d_same(x: jnp.ndarray, w: jnp.ndarray, b=None, dilation: int = 1) -> jnp.ndarray:
    """x [B,T,Cin], w torch-layout [Cout, Cin, k], pad k//2 both sides."""
    k = w.shape[-1]
    pad = k // 2
    w_wio = jnp.transpose(w, (2, 1, 0))  # [k, in, out]
    y = lax.conv_general_dilated(
        x, w_wio.astype(x.dtype),
        window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv1d_strided(x: jnp.ndarray, w: jnp.ndarray, b=None, stride: int = 1,
                   pad: int = 0, dilation: int = 1) -> jnp.ndarray:
    """General conv1d (torch Conv1d semantics) for the WavLM feature stack."""
    w_wio = jnp.transpose(w, (2, 1, 0))
    y = lax.conv_general_dilated(
        x, w_wio.astype(x.dtype),
        window_strides=(stride,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv1d_depthwise_same(x: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """Depthwise conv, w torch-layout [C, 1, k], pad k//2."""
    C = x.shape[-1]
    k = w.shape[-1]
    pad = k // 2
    w_wio = jnp.transpose(w, (2, 1, 0))  # [k, 1, C]
    y = lax.conv_general_dilated(
        x, w_wio.astype(x.dtype),
        window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=_DN, feature_group_count=C,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride: int = 1) -> jnp.ndarray:
    """Transposed conv, w torch-layout [Cin, Cout, k], padding 0:
    out_len = (T-1)*stride + k. Implemented as an input-dilated conv with the
    kernel flipped along time and in/out transposed."""
    k = w.shape[-1]
    w_wio = jnp.transpose(w[:, :, ::-1], (2, 0, 1))  # [k, in, out]
    y = lax.conv_general_dilated(
        x, w_wio.astype(x.dtype),
        window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear_interpolate(
    x: jnp.ndarray,
    src_lengths: jnp.ndarray,
    dst_lengths: jnp.ndarray,
    dst_size: int,
    scale_override: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Per-example 1-D bilinear resize along time with half-pixel centers.

    x: [B, T_src, C]; src_lengths/dst_lengths: [B] true lengths; output
    [B, dst_size, C] valid for t < dst_lengths[b] (rest is clamped garbage —
    callers mask it). Index math mirrors GGML's bilinear upscale: dx is taken
    from the unclamped floor, then indices clamp to [0, src_len-1].

    ``scale_override = (src_anchor, dst_anchor)`` pins the resampling ratio
    to a fixed value independent of the true lengths (streaming mode: prefix
    re-decodes of growing sequences must not shift the time axis)."""
    B, T_src, C = x.shape
    dst_idx = jnp.arange(dst_size, dtype=jnp.float32)[None, :]  # [1, D]
    if scale_override is not None:
        sf = jnp.full((B,), scale_override[1] / scale_override[0], jnp.float32)
    else:
        sf = dst_lengths.astype(jnp.float32) / jnp.maximum(src_lengths.astype(jnp.float32), 1.0)
    pos = (dst_idx + 0.5) / sf[:, None] - 0.5  # [B, D]
    x0f = jnp.floor(pos)
    dx = pos - x0f
    max_idx = jnp.maximum(src_lengths - 1, 0)[:, None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, max_idx)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, max_idx)
    g0 = jnp.take_along_axis(x, x0[:, :, None], axis=1)
    g1 = jnp.take_along_axis(x, x1[:, :, None], axis=1)
    y = g0 + (g1 - g0) * dx[:, :, None].astype(x.dtype)
    return y
