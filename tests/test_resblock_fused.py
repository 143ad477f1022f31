"""Fused resblock-layer kernel parity: the single-kernel
conv2(actB(conv1(actA(x)))) + x (ops/pallas/resblock.py, interpret mode)
must match the unfused four-op chain, including replicate-pad edge
semantics, ragged lengths, and the padding invariance the head/tail
splice is responsible for."""

import numpy as np
import pytest

from miotts_tpu.models import vocoder as V

jnp = pytest.importorskip("jax.numpy")


def _act(rng, C, k):
    f = np.hanning(k + 2)[1:-1].astype(np.float32)
    f = f / f.sum()
    return {
        "alpha": jnp.asarray(rng.randn(C).astype(np.float32) * 0.2),
        "beta": jnp.asarray(rng.randn(C).astype(np.float32) * 0.2),
        "up_filter": jnp.asarray(f),
        "down_filter": jnp.asarray(f * 0.9),
    }


def _mk(rng, B, T, C, k_conv=3):
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.4)
    actA = _act(rng, C, 12)
    actB = _act(rng, C, 12)
    w1 = jnp.asarray(rng.randn(C, C, k_conv).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(C, C, k_conv).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    return x, actA, actB, w1, b1, w2, b2


def _composite(x, lengths, actA, w1, b1, dil, actB, w2, b2):
    r1, l1 = V.activation1d(x, lengths, actA, impl="xla")
    r2 = V.conv1d_same(r1, l1, w1, b1, dil, impl="xla")
    r3, l3 = V.activation1d(r2, l1, actB, impl="xla")
    return V.conv1d_same(r3, l3, w2, b2, 1, residual=x, impl="xla")


@pytest.mark.parametrize("dil", [1, 3, 5])
def test_fused_layer_matches_composite(dil):
    from miotts_tpu.ops.pallas.resblock import fused_resblock_layer

    rng = np.random.RandomState(0 + dil)
    B, T, C = 2, 1400, 64
    x, actA, actB, w1, b1, w2, b2 = _mk(rng, B, T, C)
    lengths = jnp.asarray([T, T - 333], jnp.int32)
    x = V.mask_time(x, lengths)
    want = _composite(x, lengths, actA, w1, b1, dil, actB, w2, b2)
    got = fused_resblock_layer(
        x, lengths, actA, w1, b1, dil, actB, w2, b2,
        lambda xs, ls: _composite(xs, ls, actA, w1, b1, dil, actB, w2, b2),
        interpret=True)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5


def test_fused_layer_padding_invariance():
    """Bit-equal outputs for the valid rows when the same signal rides a
    longer padded bucket (the serving bucket invariant)."""
    from miotts_tpu.ops.pallas.resblock import fused_resblock_layer

    rng = np.random.RandomState(7)
    B, T, C = 1, 1200, 64
    x, actA, actB, w1, b1, w2, b2 = _mk(rng, B, T, C)
    lengths = jnp.asarray([T], jnp.int32)

    def run(xp):
        return np.asarray(fused_resblock_layer(
            xp, lengths, actA, w1, b1, 3, actB, w2, b2,
            lambda xs, ls: _composite(xs, ls, actA, w1, b1, 3, actB, w2, b2),
            interpret=True))

    y1 = run(x)
    xpad = jnp.pad(x, ((0, 0), (0, 480), (0, 0)))
    y2 = run(xpad)
    np.testing.assert_array_equal(y1, y2[:, :T])
    assert np.all(y2[:, T:] == 0.0)


def test_dispatch_in_vocoder_layer_interpret(monkeypatch):
    """models/vocoder.py _resblock_layer routes to the fused kernel under
    impl='interpret' and matches the unfused chain."""
    rng = np.random.RandomState(3)
    B, T, C = 1, 1100, 32
    x, actA, actB, w1, b1, w2, b2 = _mk(rng, B, T, C)
    rb = {"acts": [actA, actB] * 3,
          "convs1": [{"w": w1, "b": b1}] * 3,
          "convs2": [{"w": w2, "b": b2}] * 3}
    lengths = jnp.asarray([T - 100], jnp.int32)
    x = V.mask_time(x, lengths)
    got = V._resblock_layer(x, lengths, rb, 0, 3, impl="interpret")
    monkeypatch.setenv("MIOTTS_RESBLOCK_FUSE", "0")
    want = V._resblock_layer(x, lengths, rb, 0, 3, impl="interpret")
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5
