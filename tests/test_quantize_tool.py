"""Offline GGUF requantize tool (convert/quantize.py): byte-level KV copy,
matmul-only rewriting, and engine-level equivalence with the on-load
requantization path."""

import numpy as np
import pytest

from miotts_tpu.convert.quantize import requantize_gguf
from miotts_tpu.gguf import GGUFReader
from miotts_tpu.gguf.quants import GGMLType
from miotts_tpu.runtime.native import q4_available
from miotts_tpu.testing import write_synthetic_llm_gguf

pytestmark = pytest.mark.skipif(
    not q4_available(), reason="native q4 runtime unavailable")


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("quant_tool")
    src = d / "llm_f32.gguf"
    dst = d / "llm_q4.gguf"
    write_synthetic_llm_gguf(str(src), n_audio=96, seed=7)
    counts = requantize_gguf(src, dst, "q4_0")
    return src, dst, counts


def test_kv_and_tensor_table(paths):
    src, dst, counts = paths
    rs, rd = GGUFReader(src), GGUFReader(dst)
    # KV metadata byte-copied -> parsed dict identical
    assert rs.kv == rd.kv
    assert set(rs.tensors) == set(rd.tensors)
    for name, si in rs.tensors.items():
        di = rd.tensors[name]
        assert si.shape == di.shape, name
        if (len(si.shape) == 2 and si.shape[1] % 32 == 0
                and name.endswith(".weight") and "norm" not in name):
            assert di.ggml_type == GGMLType.Q4_0, name
        else:
            # untouched tensors are byte-identical
            assert di.ggml_type == si.ggml_type, name
            np.testing.assert_array_equal(rs.tensor_raw(name),
                                          rd.tensor_raw(name))
    assert counts.get("Q4_0", 0) > 0
    rs.close()
    rd.close()


def test_requantized_file_greedy_matches_xla(paths):
    """The tool's output file decodes identically on the native CPU engine
    and the XLA engine (both read the same Q4_0 payloads; only activation
    quantization differs — same as the handwritten-GGUF roundtrip test).
    Note the tool also quantizes token_embd (like llama-quantize), so its
    output intentionally differs from MIOTTS_CPU_QUANT=q4_0 on an untied
    f32 source, where the embedding table stays f32."""
    from miotts_tpu.models.llm import LLMEngine
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine
    from miotts_tpu.models.sampling import SamplerParams

    _, dst, _ = paths
    eng_file = NativeCpuLLMEngine(str(dst))
    assert eng_file.quantize == "q4_0-cpu"
    xla = LLMEngine(str(dst))
    sp = SamplerParams(temp=0.0, top_k=50, seed=5)
    a = eng_file.generate_audio_tokens("quantize tool", n_predict=16,
                                       sampler=sp)
    b = xla.generate_audio_tokens("quantize tool", n_predict=16, sampler=sp)
    assert a == b and len(a) > 0


def test_q8_source_to_q4(tmp_path):
    """Q8_0 payloads requantize to Q4_0 (dequant -> quant) and still load."""
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine

    src = tmp_path / "llm_q8.gguf"
    dst = tmp_path / "llm_q8_to_q4.gguf"
    write_synthetic_llm_gguf(str(src), n_audio=96, seed=8, quant="q8_0")
    counts = requantize_gguf(src, dst, "q4_0")
    assert counts.get("Q4_0", 0) > 0
    eng = NativeCpuLLMEngine(str(dst))
    assert eng.quantize == "q4_0-cpu"
    toks = eng.generate_audio_tokens("hi", n_predict=8)
    assert len(toks) > 0
