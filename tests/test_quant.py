"""Quantized (Q8_0-in-HBM) LLM path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miotts_tpu.models.llm import (
    SamplerParams, init_kv_cache, llm_generate, llm_prefill, load_llm_gguf,
)
from miotts_tpu.ops.pallas.quant_matmul import (
    dequant_dense, maybe_quant_matmul, q8_matmul, quantize_q8_cols,
)
from miotts_tpu.testing import write_synthetic_llm_gguf


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = (rng.randn(256, 384) * 0.1).astype(np.float32)
    q, s = quantize_q8_cols(w)
    deq = q.astype(np.float32) * np.repeat(s, 32, axis=0)
    blocks = np.abs(w).reshape(-1, 32, 384).max(axis=1)
    bound = np.repeat(blocks / 127.0, 32, axis=0) * 0.51 + 1e-7
    assert (np.abs(deq - w) <= bound).all()


def test_q8_matmul_interpret_matches_dense():
    rng = np.random.RandomState(1)
    K, N, T = 256, 384, 8
    w = (rng.randn(K, N) * 0.1).astype(np.float32)
    q, s = quantize_q8_cols(w)
    x = (rng.randn(T, K) * 0.5).astype(np.float32)
    dense = x @ (q.astype(np.float32) * np.repeat(s, 32, axis=0))
    got = np.asarray(q8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
                               block_k=256, block_n=128, interpret=True))
    # bf16 tile dot: ~1e-2 relative
    np.testing.assert_allclose(got, dense, rtol=2e-2, atol=2e-2)


def test_maybe_quant_matmul_cpu_fallback():
    rng = np.random.RandomState(2)
    w = (rng.randn(64, 96) * 0.1).astype(np.float32)
    q, s = quantize_q8_cols(w)
    leaf = {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    x = jnp.asarray((rng.randn(3, 64)).astype(np.float32))
    got = maybe_quant_matmul(x, leaf)
    expect = np.asarray(x) @ np.asarray(dequant_dense(leaf))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def quant_llm(tmp_path_factory):
    path = tmp_path_factory.mktemp("qllm") / "llm.gguf"
    # dims chosen so quant leaves exercise lane padding (qkv out 32 -> 128)
    write_synthetic_llm_gguf(str(path), n_audio=64, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=64, seed=0)
    cfg_d, w_d, tok = load_llm_gguf(str(path), dtype=jnp.float32, quantize=False)
    cfg_q, w_q, _ = load_llm_gguf(str(path), dtype=jnp.float32, quantize=True)
    assert cfg_d == cfg_q
    return cfg_d, w_d, w_q, tok


def test_quant_prefill_close_to_dense(quant_llm):
    """Quantized path vs a dense path rebuilt from the SAME dequantized
    weights: only bf16 matmul rounding should differ."""
    cfg, w_d, w_q, tok = quant_llm
    # rebuild dense weights from the quantized leaves -> same numerics source
    w_mixed = dict(w_q)
    for k in ("wqkv", "wo", "w_gateup", "w_down", "output"):
        if isinstance(w_q[k], dict):
            if w_q[k]["q"].ndim == 3:  # stacked layers
                dq = jax.vmap(lambda q, s: q.astype(jnp.float32)
                              * jnp.repeat(s, 32, axis=0))(w_q[k]["q"], w_q[k]["s"])
            else:
                dq = dequant_dense(w_q[k])
            w_mixed[k] = dq

    tokens = np.array([[5, 200, 17, 92, 260, 3]], np.int32)
    lengths = jnp.asarray([6], jnp.int32)
    ck, cv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ref, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w_mixed, jnp.asarray(tokens), lengths, ck, cv)
    got, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w_q, jnp.asarray(tokens), lengths, ck, cv)
    # CPU fallback path dequantizes identically -> near-exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_quant_generation_runs(quant_llm):
    cfg, w_d, w_q, tok = quant_llm
    tokens = np.array([[5, 200, 17, 92]], np.int32)
    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    eog = jnp.asarray([-1], jnp.int32)
    out, n = llm_generate(cfg, w_q, jnp.asarray(tokens),
                          jnp.asarray([4], jnp.int32), eog,
                          jax.random.PRNGKey(0), 8, SamplerParams(temp=0.8),
                          ck, cv)
    assert int(n[0]) == 8
    assert (np.asarray(out) >= 0).all()


# ---------------------------------------------------------------------------
# W8A8 per-channel int8 (MIOTTS_LLM_QUANT=int8): native MXU int8 dots
# ---------------------------------------------------------------------------

def test_int8_percol_roundtrip_error_bound():
    from miotts_tpu.ops.pallas.quant_matmul import quantize_int8_percol

    rng = np.random.RandomState(3)
    w = (rng.randn(128, 96) * 0.2).astype(np.float32)
    q8, s8 = quantize_int8_percol(w)
    deq = q8.astype(np.float32) * s8[None, :]
    bound = (np.abs(w).max(axis=0) / 127.0) * 0.51 + 1e-7
    assert (np.abs(deq - w) <= bound[None, :]).all()


def test_int8_matmul_accuracy():
    """W8A8 vs f32: per-row activation + per-col weight quantization keeps
    relative error at the percent level for gaussian data."""
    from miotts_tpu.ops.pallas.quant_matmul import int8_matmul, quantize_int8_percol

    rng = np.random.RandomState(4)
    K, N, T = 512, 384, 5
    w = (rng.randn(K, N) * 0.1).astype(np.float32)
    x = (rng.randn(T, K) * 0.7).astype(np.float32)
    q8, s8 = quantize_int8_percol(w)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q8), jnp.asarray(s8)))
    ref = x @ w
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()
    # dispatch through the leaf dict too
    via_leaf = maybe_quant_matmul(
        jnp.asarray(x), {"q8": jnp.asarray(q8), "s8": jnp.asarray(s8)})
    np.testing.assert_allclose(np.asarray(via_leaf), got, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def int8_llm(tmp_path_factory):
    path = tmp_path_factory.mktemp("i8llm") / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=64, seed=0)
    cfg_d, w_d, tok = load_llm_gguf(str(path), dtype=jnp.float32, quantize=False)
    cfg_q, w_q, _ = load_llm_gguf(str(path), dtype=jnp.float32, quantize="int8")
    assert cfg_d == cfg_q
    return cfg_d, w_d, w_q, tok


def test_int8_prefill_close_to_dense(int8_llm):
    """int8 W8A8 logits stay close to the dense f32 logits (percent-level:
    activation quantization adds error the Q8_0 path does not have)."""
    cfg, w_d, w_q, tok = int8_llm
    tokens = np.array([[5, 200, 17, 92, 260, 3]], np.int32)
    lengths = jnp.asarray([6], jnp.int32)
    ck, cv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ref, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w_d, jnp.asarray(tokens), lengths, ck, cv)
    got, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w_q, jnp.asarray(tokens), lengths, ck, cv)
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.isfinite(got).all()
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.08, np.abs(got - ref).max() / denom
    # same top-1 token on a clean synthetic model
    assert (ref.argmax(-1) == got.argmax(-1)).mean() > 0.9


def test_int8_generation_runs(int8_llm):
    cfg, w_d, w_q, tok = int8_llm
    tokens = np.array([[5, 200, 17, 92]], np.int32)
    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    eog = jnp.asarray([-1], jnp.int32)
    out, n = llm_generate(cfg, w_q, jnp.asarray(tokens),
                          jnp.asarray([4], jnp.int32), eog,
                          jax.random.PRNGKey(0), 8, SamplerParams(temp=0.8),
                          ck, cv)
    assert int(n[0]) == 8
    assert (np.asarray(out) >= 0).all()


def test_output_int8_head_only(int8_llm):
    """--llm-quant output_int8: ONLY the logits head is a W8A8 leaf (every
    layer matmul stays dense), and generation matches the dense path's
    greedy tokens on a clean synthetic model (the head is ~60% of the
    0.1B step's weight bytes; measured 24% off the decode step on chip)."""
    cfg_d, w_d, _w_q, tok = int8_llm
    import tempfile, os
    path = os.path.join(tempfile.gettempdir(), "m_oi8_test.gguf")
    write_synthetic_llm_gguf(path, n_audio=64, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=64, seed=0)
    cfg, w, _ = load_llm_gguf(path, dtype=jnp.float32,
                              quantize="output_int8")
    assert isinstance(w["output"], dict) and "q8" in w["output"]
    for k in ("wqkv", "w_gateup", "w_down", "wo"):
        assert not isinstance(w[k], dict), k  # layers stay dense
    tokens = np.array([[5, 200, 17, 92]], np.int32)
    eog = jnp.asarray([-1], jnp.int32)
    outs = []
    for ww, cc in ((w_d, cfg_d), (w, cfg)):
        ck, cv = init_kv_cache(cc, 1, 32, dtype=jnp.float32)
        out, n = llm_generate(cc, ww, jnp.asarray(tokens),
                              jnp.asarray([4], jnp.int32), eog,
                              jax.random.PRNGKey(0), 8,
                              SamplerParams(temp=0.0), ck, cv)
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_int4_matmul_storage_and_converted_forms_agree():
    """int4_matmul must be EXACT integer math in both leaf forms: the int8
    storage form ("q4i8", what the loader ships — the relay can't transfer
    int4) and the in-graph converted jnp.int4 form ("q4"), vs a numpy
    oracle."""
    import jax
    from miotts_tpu.ops.pallas.quant_matmul import (
        int4_matmul, quantize_int4_percol)

    rng = np.random.RandomState(3)
    w = rng.randn(64, 256).astype(np.float32)
    q4, s4 = quantize_int4_percol(w)
    assert q4.dtype == np.int8 and q4.min() >= -7 and q4.max() <= 7
    x = rng.randn(5, 64).astype(np.float32)

    amax = np.abs(x).max(axis=1, keepdims=True)
    sx = np.where(amax > 0, amax / 127.0, 1.0)
    x8 = np.round(x / sx).astype(np.int8)
    ref = (x8.astype(np.int64) @ q4.astype(np.int64)) * sx * s4[None, :]

    y_i8 = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(q4),
                                  jnp.asarray(s4)))
    q4dev = jax.jit(lambda a: a.astype(jnp.int4))(jnp.asarray(q4))
    y_i4 = np.asarray(int4_matmul(jnp.asarray(x), q4dev, jnp.asarray(s4)))
    np.testing.assert_allclose(y_i8, ref, rtol=1e-6)
    np.testing.assert_array_equal(y_i8, y_i4)


def test_output_int4_head_only_generates():
    """--llm-quant output_int4: only the head is a {"q4i8","s4"} leaf, every
    layer stays dense, and greedy generation runs through the in-graph
    int4 conversion (_prepare_decode_weights at the decode-loop entry)."""
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "m_oi4_test.gguf")
    write_synthetic_llm_gguf(path, n_audio=64, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=64, seed=0)
    cfg, w, _ = load_llm_gguf(path, dtype=jnp.float32,
                              quantize="output_int4")
    assert isinstance(w["output"], dict) and "q4i8" in w["output"]
    for k in ("wqkv", "w_gateup", "w_down", "wo"):
        assert not isinstance(w[k], dict), k
    tokens = np.array([[5, 200, 17, 92]], np.int32)
    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    out, n = llm_generate(cfg, w, jnp.asarray(tokens),
                          jnp.asarray([4], jnp.int32),
                          jnp.asarray([-1], jnp.int32),
                          jax.random.PRNGKey(0), 8,
                          SamplerParams(temp=0.0), ck, cv)
    assert int(n[0]) == 8
    assert (np.asarray(out) >= 0).all()


def test_tied_embedding_head_quant_warns(capsys):
    """Head-quant requests can't apply to tied-embedding models (no
    output.weight): the loader warns instead of silently serving dense
    while /mio/health reports the requested mode."""
    from miotts_tpu.models.llm import _warn_tied_quant_noop

    assert _warn_tied_quant_noop(True, "output_int4") is None
    assert "cannot quantize" in capsys.readouterr().err
    assert _warn_tied_quant_noop(False, "") is None
    assert capsys.readouterr().err == ""


def test_int8_output_int4_combined(int8_llm):
    """--llm-quant int8_output_int4: every layer matmul is a W8A8
    {"q8","s8"} leaf AND the head is the W4A8 {"q4i8","s4"} leaf — the
    two modes stack (they target disjoint weight bytes; slope-measured
    -34%/-36% separately on the 0.1B step, DESIGN.md). Greedy codes must
    match the plain-int8 engine except where the head's 4-bit error
    flips a near-tie, and logits stay percent-close to dense."""
    import os
    import tempfile

    cfg_ref, w_dense, w_int8, tok = int8_llm
    path = os.path.join(tempfile.gettempdir(), "m_i8oi4_test.gguf")
    write_synthetic_llm_gguf(path, n_audio=64, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, ffn=64, seed=0)
    cfg, w, _ = load_llm_gguf(path, dtype=jnp.float32,
                              quantize="int8_output_int4")
    assert cfg == cfg_ref
    assert isinstance(w["output"], dict) and "q4i8" in w["output"]
    for k in ("wqkv", "w_gateup", "w_down", "wo"):
        assert isinstance(w[k], dict) and "q8" in w[k], k

    tokens = np.array([[5, 200, 17, 92, 260, 3]], np.int32)
    lengths = jnp.asarray([6], jnp.int32)
    ck, cv = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    ref, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w_dense, jnp.asarray(tokens), lengths, ck, cv)
    got, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w, jnp.asarray(tokens), lengths, ck, cv)
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.isfinite(got).all()
    denom = np.abs(ref).max() + 1e-9
    # int8-only bounds at 0.08 above; the 4-bit head at dim=32 is coarse
    # (15 levels per column), so the stacked bound is looser — measured
    # ~0.11 on this toy model, far tighter at production dim=768
    assert np.abs(got - ref).max() / denom < 0.16, \
        np.abs(got - ref).max() / denom

    # vs the plain-int8 engine the ONLY difference is the head's 4-bit
    # weights (layer paths share the same q8 leaves) — the logits delta
    # is pure int4 quantization error and the top-1 token agrees
    got8, _, _ = jax.jit(llm_prefill, static_argnums=0)(
        cfg, w_int8, jnp.asarray(tokens), lengths,
        *init_kv_cache(cfg, 1, 16, dtype=jnp.float32))
    got8 = np.asarray(got8)
    denom8 = np.abs(got8).max() + 1e-9
    assert np.abs(got - got8).max() / denom8 < 0.16
    assert (got.argmax(-1) == got8.argmax(-1)).all()

    ck, cv = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    eog = jnp.asarray([-1], jnp.int32)
    out, n = llm_generate(cfg, w, jnp.asarray(tokens[:, :4]),
                          jnp.asarray([4], jnp.int32), eog,
                          jax.random.PRNGKey(0), 8, SamplerParams(temp=0.0),
                          ck, cv)
    assert int(n[0]) == 8
    assert (np.asarray(out) >= 0).all()
