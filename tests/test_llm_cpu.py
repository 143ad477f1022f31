"""Native int8 CPU LLM engine: kernel exactness vs a numpy Q8_0 oracle,
greedy agreement with the XLA engine, determinism, and the streaming API."""

import numpy as np
import pytest

from miotts_tpu.runtime.native import (
    Q8Gemv, q8_available, q8_quantize_weights, q8_row_dequant,
)

pytestmark = pytest.mark.skipif(
    not q8_available(), reason="native q8 runtime unavailable")


def _q8_oracle(w: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Independent block-quantized reference: both sides quantized per-32
    block exactly as the kernel does, f16 weight scales."""
    n, k = w.shape
    bw = w.reshape(n, k // 32, 32)
    dw = np.abs(bw).max(2) / 127.0
    qw = np.rint(bw / np.where(dw == 0, 1, dw)[:, :, None]).astype(np.int8)
    bx = x.reshape(k // 32, 32)
    dx = (np.abs(bx).max(1) / 127.0).astype(np.float32)
    inv = np.where(dx > 0, 1.0 / np.where(dx == 0, 1, dx), 0.0)
    qx = np.rint(bx * inv[:, None]).astype(np.int8)
    dots = (qw.astype(np.int32) * qx.astype(np.int32)[None]).sum(2)
    scales = dw.astype(np.float16).astype(np.float32) * dx
    return (dots * scales).sum(1).astype(np.float32)


@pytest.mark.parametrize("n,k", [(64, 64), (256, 768), (768, 2048), (33, 96)])
def test_q8_gemv_matches_oracle(n, k):
    rng = np.random.RandomState(n + k)
    w = rng.randn(n, k).astype(np.float32)
    x = rng.randn(k).astype(np.float32)
    g = Q8Gemv(q8_quantize_weights(w), n, k)
    got = g(x)
    ref = _q8_oracle(w, x)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
    # threaded path must agree exactly (same per-row arithmetic)
    np.testing.assert_array_equal(got, g(x, n_threads=4))


def test_q8_row_dequant_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(17, 96).astype(np.float32)
    raw = q8_quantize_weights(w)
    for row in (0, 7, 16):
        got = q8_row_dequant(raw, row, 96)
        # Q8_0 roundtrip bound: rounding scale/2 + the f16 scale storage
        # error (<= 2^-11 relative on a q up to 127 => ~0.062*scale)
        scale = np.abs(w[row]).reshape(3, 32).max(1) / 127.0
        err = np.abs(got - w[row]).reshape(3, 32).max(1)
        assert (err <= scale * 0.6 + 1e-7).all()


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    from miotts_tpu.models.llm import LLMEngine
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine
    from miotts_tpu.testing import write_synthetic_llm_gguf

    path = tmp_path_factory.mktemp("llmcpu") / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=128, seed=1)
    return NativeCpuLLMEngine(str(path)), LLMEngine(str(path))


def test_greedy_matches_xla_engine(engines):
    """temp=0 generations agree with the f32 XLA engine on the tiny model
    (Q8_0 noise at tiny dims does not flip the argmax chain here; this
    guards the whole numpy decode step: rope/gqa/silu/norm wiring)."""
    from miotts_tpu.models.sampling import SamplerParams

    cpu, xla = engines
    sp = SamplerParams(temp=0.0, top_k=50, seed=3)
    got = cpu.generate_audio_tokens("Hello world", n_predict=24, sampler=sp)
    ref = xla.generate_audio_tokens("Hello world", n_predict=24, sampler=sp)
    assert got == ref


def test_sampled_deterministic_and_streaming(engines):
    from miotts_tpu.models.sampling import SamplerParams

    cpu, _ = engines
    sp = SamplerParams(temp=0.8, top_k=40, top_p=0.9, repeat_penalty=1.1,
                      seed=11)
    a = cpu.generate_audio_tokens("stream me", n_predict=16, sampler=sp)
    b = cpu.generate_audio_tokens("stream me", n_predict=16, sampler=sp)
    assert a == b and len(a) > 0
    seen = []

    def on_token(tok, i, is_eog):
        seen.append((tok, i))
        return i < 7  # cancel after 8 tokens

    c = cpu.generate_audio_tokens_streaming("stream me", on_token,
                                            n_predict=16, sampler=sp)
    assert [t for t, _ in seen] == c
    assert len(c) <= 9


def test_q8_0_gguf_roundtrip_both_engines(tmp_path):
    """A GGUF written with Q8_0 matmul payloads loads in BOTH engines (the
    XLA loader dequantizes; the native engine keeps the raw blocks) and
    auto-detection flags it; greedy generations agree (same quantized
    weights up to activation quantization at tiny dims)."""
    from miotts_tpu.models.llm import LLMEngine
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine, gguf_llm_is_q8
    from miotts_tpu.models.sampling import SamplerParams
    from miotts_tpu.testing import write_synthetic_llm_gguf

    path = tmp_path / "llm_q8.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=96, seed=2, quant="q8_0")
    assert gguf_llm_is_q8(str(path))
    cpu = NativeCpuLLMEngine(str(path))
    xla = LLMEngine(str(path))
    sp = SamplerParams(temp=0.0, top_k=50, seed=1)
    got = cpu.generate_audio_tokens("hello", n_predict=16, sampler=sp)
    ref = xla.generate_audio_tokens("hello", n_predict=16, sampler=sp)
    assert got == ref


def test_gguf_q8_detection(tmp_path, engines):
    from miotts_tpu.models.llm_cpu import gguf_llm_is_q8

    # synthetic GGUFs are f32 -> not q8
    cpu, _ = engines
    assert not gguf_llm_is_q8(str(tmp_path / "missing.gguf"))


def test_cli_cpu_native_flag(tmp_path, engines):
    """--cpu-native on routes CLI generation through the native engine."""
    from miotts_tpu.cli import _make_llm_engine
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine

    class Args:
        cpu_native = "on"
        llm_quant = ""
        model = None

    # reuse the fixture's gguf path via the engine's loaded state is not
    # possible; rebuild a tiny one
    from miotts_tpu.testing import write_synthetic_llm_gguf

    path = tmp_path / "llm.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=64, seed=0)
    Args.model = str(path)
    eng = _make_llm_engine(Args)
    assert isinstance(eng, NativeCpuLLMEngine)
    Args.cpu_native = "auto"  # f32 gguf -> XLA engine
    eng2 = _make_llm_engine(Args)
    assert not isinstance(eng2, NativeCpuLLMEngine)


# ---------------------------------------------------------------------------
# Q4_0 (W4A8) path — half the weight traffic of Q8_0 on the bandwidth-bound
# gemv; kernel layout must match the repo's own GGUF Q4_0 dequant exactly.
# ---------------------------------------------------------------------------

from miotts_tpu.runtime.native import (  # noqa: E402
    Q4Gemv, q4_available, q4_quantize_weights, q4_row_dequant,
)

q4mark = pytest.mark.skipif(
    not q4_available(), reason="native q4 runtime unavailable")


def _q4_oracle(w: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Independent reference: weights through the package's own Q4_0
    dequant (gguf.quants), activations per-32-block int8 like the kernel."""
    from miotts_tpu.gguf.quants import GGMLType, dequantize

    n, k = w.shape
    wd = dequantize(q4_quantize_weights(w), GGMLType.Q4_0, n * k).reshape(n, k)
    bx = x.reshape(k // 32, 32)
    dx = (np.abs(bx).max(1) / 127.0).astype(np.float32)
    inv = np.where(dx > 0, 1.0 / np.where(dx == 0, 1, dx), 0.0)
    qx = np.rint(bx * inv[:, None]).astype(np.int8)
    return (wd @ (qx * dx[:, None]).reshape(k)).astype(np.float32)


@q4mark
@pytest.mark.parametrize("n,k", [(64, 64), (256, 768), (768, 2048), (33, 96)])
def test_q4_gemv_matches_oracle(n, k):
    rng = np.random.RandomState(n * 7 + k)
    w = rng.randn(n, k).astype(np.float32)
    x = rng.randn(k).astype(np.float32)
    g = Q4Gemv(q4_quantize_weights(w), n, k)
    got = g(x)
    ref = _q4_oracle(w, x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(got, g(x, n_threads=4))


@q4mark
def test_q4_row_dequant_matches_gguf_dequant():
    from miotts_tpu.gguf.quants import GGMLType, dequantize

    rng = np.random.RandomState(3)
    w = rng.randn(9, 128).astype(np.float32)
    raw = q4_quantize_weights(w)
    wd = dequantize(raw, GGMLType.Q4_0, w.size).reshape(w.shape)
    for row in (0, 4, 8):
        np.testing.assert_allclose(q4_row_dequant(raw, row, 128), wd[row],
                                   rtol=1e-6, atol=0)


@q4mark
def test_q4_0_gguf_roundtrip_both_engines(tmp_path):
    """A GGUF written with Q4_0 matmul payloads (a llama.cpp 4-bit export)
    loads in BOTH engines — the XLA loader dequantizes, the native engine
    runs the raw blocks — auto-detection flags it, and greedy generations
    agree (identical effective weights; only activation quantization
    differs, same as the Q8_0 case)."""
    from miotts_tpu.models.llm import LLMEngine
    from miotts_tpu.models.llm_cpu import (
        NativeCpuLLMEngine, gguf_llm_cpu_native_ok,
    )
    from miotts_tpu.models.sampling import SamplerParams
    from miotts_tpu.testing import write_synthetic_llm_gguf

    path = tmp_path / "llm_q4.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=96, seed=4, quant="q4_0")
    assert gguf_llm_cpu_native_ok(str(path))
    cpu = NativeCpuLLMEngine(str(path))
    assert cpu.quantize == "q4_0-cpu"
    xla = LLMEngine(str(path))
    sp = SamplerParams(temp=0.0, top_k=50, seed=1)
    got = cpu.generate_audio_tokens("hello", n_predict=16, sampler=sp)
    ref = xla.generate_audio_tokens("hello", n_predict=16, sampler=sp)
    assert got == ref


@q4mark
def test_cpu_quant_force_q4(tmp_path, monkeypatch):
    """MIOTTS_CPU_QUANT=q4_0 requantizes an f32 GGUF to int4 on load and
    the decode stays deterministic and audio-token-valid."""
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine
    from miotts_tpu.models.sampling import SamplerParams
    from miotts_tpu.testing import write_synthetic_llm_gguf

    path = tmp_path / "llm_f32.gguf"
    write_synthetic_llm_gguf(str(path), n_audio=96, seed=5)
    monkeypatch.setenv("MIOTTS_CPU_QUANT", "q4_0")
    cpu = NativeCpuLLMEngine(str(path))
    assert cpu.quantize == "q4_0-cpu"
    sp = SamplerParams(temp=0.8, top_k=40, seed=9)
    a = cpu.generate_audio_tokens("force q4", n_predict=12, sampler=sp)
    b = cpu.generate_audio_tokens("force q4", n_predict=12, sampler=sp)
    assert a == b and len(a) > 0


def test_gemm_matches_gemv_rows():
    """Batched gemm == per-row gemv bit-for-bit (same quantization and dot
    per row; only the weight-streaming order differs)."""
    from miotts_tpu.runtime.native import Q8Gemv, q8_quantize_weights

    rng = np.random.RandomState(11)
    # (768, 2048, 4): n*k*B over the pool cutoff so the threaded
    # chunked-row qgemm path (the one production prefill uses for
    # ffn/head matmuls) is actually exercised, not just the serial branch
    for (n, k, B) in [(96, 128, 5), (768, 2048, 4)]:
        w = rng.randn(n, k).astype(np.float32)
        X = rng.randn(B, k).astype(np.float32)
        g8 = Q8Gemv(q8_quantize_weights(w), n, k)
        got = g8.gemm(X)
        ref = np.stack([g8(X[b]) for b in range(B)])
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, g8.gemm(X, n_threads=4))
        if q4_available():
            g4 = Q4Gemv(q4_quantize_weights(w), n, k)
            got4 = g4.gemm(X)
            ref4 = np.stack([g4(X[b]) for b in range(B)])
            np.testing.assert_array_equal(got4, ref4)
            np.testing.assert_array_equal(got4, g4.gemm(X, n_threads=4))


def test_blocked_prefill_matches_sequential_step(engines):
    """_prefill (batched-gemm prompt eval) reproduces the token-by-token
    _step chain: same final logits, same KV cache contents."""
    cpu, _ = engines
    rng = np.random.RandomState(3)
    ids = rng.randint(0, cpu.vocab_size, 21).tolist()  # odd length: 16+5
    S = len(ids) + 4
    kc1 = np.zeros((cpu.n_layers, S, cpu.n_kv, cpu.head_dim), np.float32)
    vc1 = np.zeros_like(kc1)
    kc2 = np.zeros_like(kc1)
    vc2 = np.zeros_like(vc1)
    logits_seq = None
    for pos, tok in enumerate(ids):
        logits_seq = cpu._step(int(tok), pos, kc1, vc1)
    logits_blk = cpu._prefill(ids, kc2, vc2)
    np.testing.assert_allclose(logits_blk, logits_seq, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(kc2, kc1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vc2, vc1, rtol=1e-5, atol=1e-6)


def test_cpu_native_env_fallback(monkeypatch):
    """MIOTTS_CPU_NATIVE=1/0 sets the --cpu-native default (the env knob
    the module docstring promises)."""
    from miotts_tpu.cli import build_parser

    monkeypatch.setenv("MIOTTS_CPU_NATIVE", "1")
    assert build_parser().get_default("cpu_native") == "on"
    monkeypatch.setenv("MIOTTS_CPU_NATIVE", "0")
    assert build_parser().get_default("cpu_native") == "off"
    monkeypatch.delenv("MIOTTS_CPU_NATIVE")
    assert build_parser().get_default("cpu_native") == "auto"


def test_shared_engine_concurrent_generations(engines):
    """Two threads generating on ONE engine (the embed.py shared-engine
    pattern) produce exactly what single-threaded runs produce — per-call
    gemm scratch and local-return rope tables make the engine
    thread-safe."""
    import concurrent.futures

    from miotts_tpu.models.sampling import SamplerParams

    cpu, _ = engines
    prompts = ["thread one says", "thread two answers"]
    sp = [SamplerParams(temp=0.8, top_k=40, seed=21),
          SamplerParams(temp=0.8, top_k=40, seed=22)]
    expect = [cpu.generate_audio_tokens(p, n_predict=12, sampler=s)
              for p, s in zip(prompts, sp)]
    for _ in range(3):  # a few rounds to give interleavings a chance
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            got = list(ex.map(
                lambda a: cpu.generate_audio_tokens(a[0], n_predict=12,
                                                    sampler=a[1]),
                zip(prompts, sp)))
        assert got == expect
