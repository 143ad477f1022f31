"""Banded attention: blocked and Pallas paths must equal the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.ops.attention import (
    banded_attention, banded_attention_blocked, banded_attention_dense,
)


def _rand_qkv(rng, B, T, H, D):
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("T,window,block_q", [
    (300, 65, 128), (512, 65, 128), (130, 9, 64), (257, 33, 128),
])
def test_blocked_equals_dense(T, window, block_q):
    rng = np.random.RandomState(0)
    B, H, D = 2, 4, 16
    q, k, v = _rand_qkv(rng, B, T, H, D)
    lengths = jnp.asarray([T, max(1, T - 57)], jnp.int32)
    dense = banded_attention_dense(q, k, v, lengths, window)
    blocked = banded_attention_blocked(q, k, v, lengths, window, block_q=block_q)
    # compare only valid positions (padded-query rows differ by design)
    for b, L in enumerate([T, max(1, T - 57)]):
        np.testing.assert_allclose(np.array(blocked[b, :L]), np.array(dense[b, :L]),
                                   rtol=2e-5, atol=2e-6)


def test_dispatch_shapes():
    rng = np.random.RandomState(1)
    q, k, v = _rand_qkv(rng, 1, 96, 2, 8)
    out = banded_attention(q, k, v, jnp.asarray([96], jnp.int32), 9)
    assert out.shape == (1, 96, 2, 8)
    q, k, v = _rand_qkv(rng, 1, 384, 2, 8)
    out = banded_attention(q, k, v, jnp.asarray([300], jnp.int32), 65)
    assert out.shape == (1, 384, 2, 8)


def test_pallas_kernel_equals_dense():
    """Pallas kernel in interpret mode (CPU) vs dense reference."""
    from miotts_tpu.ops.pallas.banded_attention import banded_attention_pallas

    rng = np.random.RandomState(2)
    BH, T, D = 4, 512, 64
    q = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    lengths = jnp.asarray([512, 400, 300, 129], jnp.int32)
    window = 65

    out = banded_attention_pallas(q, k, v, lengths, window, interpret=True)

    # dense reference on the folded layout
    dense = banded_attention_dense(
        q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], lengths, window
    )[:, :, 0, :]
    for b, L in enumerate([512, 400, 300, 129]):
        np.testing.assert_allclose(np.array(out[b, :L]), np.array(dense[b, :L]),
                                   rtol=2e-5, atol=2e-6)


def test_impl_env_dispatch(monkeypatch):
    rng = np.random.RandomState(3)
    q, k, v = _rand_qkv(rng, 1, 384, 2, 64)
    lengths = jnp.asarray([384], jnp.int32)
    ref = banded_attention_dense(q, k, v, lengths, 65)
    for impl in ("dense", "blocked"):
        monkeypatch.setenv("MIOTTS_ATTN_IMPL", impl)
        got = banded_attention(q, k, v, lengths, 65)
        np.testing.assert_allclose(np.array(got), np.array(ref), rtol=2e-5, atol=2e-6)
