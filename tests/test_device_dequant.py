"""Raw-payload upload + on-device dequant must be BIT-identical to the
host dequant path (runtime/device_dequant.py): both compute
f32(scale) * f32(int) and round once to bf16. Covers Q8_0, Q4_0 and F16
sources, single/stacked/fused-concat leaves, and the loader wiring
(MIOTTS_DEVICE_DEQUANT on vs off)."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from miotts_tpu.models.llm import load_llm_gguf
from miotts_tpu.testing import write_synthetic_llm_gguf


@pytest.fixture(scope="module", params=["q8_0", "q4_0", "f16"])
def gguf_path(request):
    d = tempfile.mkdtemp()
    path = os.path.join(d, f"dev_deq_{request.param}.gguf")
    write_synthetic_llm_gguf(
        path, n_audio=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn=96, seed=3, quant=request.param)
    return path


def _load(path, monkeypatch, enabled):
    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "1" if enabled else "0")
    return load_llm_gguf(path)


def test_leaves_bit_equal(gguf_path, monkeypatch):
    cfg_h, w_host, _ = _load(gguf_path, monkeypatch, enabled=False)
    cfg_d, w_dev, _ = _load(gguf_path, monkeypatch, enabled=True)
    assert cfg_h == cfg_d
    checked = 0
    for k in w_host:
        if w_host[k] is None:
            assert w_dev[k] is None
            continue
        h, d = w_host[k], w_dev[k]
        if isinstance(h, dict):  # quantized-HBM leaves don't use this path
            continue
        assert h.shape == d.shape and h.dtype == d.dtype, k
        if h.dtype == jnp.bfloat16:
            checked += 1
        assert np.array_equal(
            np.asarray(h.astype(jnp.float32)),
            np.asarray(d.astype(jnp.float32))), f"leaf {k} differs"
    assert checked >= 4  # embd, wqkv, w_gateup, wo, w_down, output


def test_unfused_layout_bit_equal(gguf_path, monkeypatch):
    monkeypatch.setenv("MIOTTS_LLM_FUSE", "0")
    _, w_host, _ = _load(gguf_path, monkeypatch, enabled=False)
    _, w_dev, _ = _load(gguf_path, monkeypatch, enabled=True)
    for k in ("wq", "wk", "wv", "w_gate", "w_up"):
        assert np.array_equal(
            np.asarray(w_host[k].astype(jnp.float32)),
            np.asarray(w_dev[k].astype(jnp.float32))), k


def test_f32_source_falls_back(monkeypatch, tmp_path):
    """F32 tensors have nothing to save — the loader must silently use the
    host path (build_leaf returns None) and still produce valid leaves."""
    path = str(tmp_path / "f32.gguf")
    write_synthetic_llm_gguf(path, n_audio=32, dim=32, n_layers=1,
                             n_heads=2, n_kv_heads=1, ffn=48, seed=0)
    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "1")
    cfg, w, _ = load_llm_gguf(path)
    assert w["token_embd"].dtype == jnp.bfloat16


def test_device_put_packed_identity(monkeypatch):
    """Packed single-transfer upload returns bit-identical leaves with
    native dtypes preserved, across dtypes and nesting."""
    from miotts_tpu.runtime.device_dequant import device_put_packed

    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "1")
    rng = np.random.RandomState(0)
    tree = {
        "a": rng.randn(33, 7).astype(np.float32),
        "nested": {"b": rng.randn(4, 5).astype(np.float16),
                   "c": rng.randint(-100, 100, (11,)).astype(np.int8)},
        "d": [rng.randn(2, 3, 4).astype(np.float64).astype(np.float32),
              np.asarray(3, np.int32)],
        "none": None,
    }
    out = device_put_packed(tree)
    import jax

    for h, d in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert h.dtype == d.dtype and h.shape == d.shape
        assert np.array_equal(np.asarray(d), h)


def test_packed_failure_falls_back_per_leaf(gguf_path, monkeypatch, capsys):
    """If the one-jit packed assemble fails (HBM pressure, compile error),
    the loader must fall back to per-leaf assembly, not fail the load."""
    import jax

    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "1")
    _, w_ref, _ = load_llm_gguf(gguf_path)

    real_jit = jax.jit

    def exploding_jit(fn, **kw):
        def run(*a, **k):
            raise RuntimeError("synthetic RESOURCE_EXHAUSTED")
        return run

    monkeypatch.setattr(jax, "jit", exploding_jit)
    try:
        _, w_fb, _ = load_llm_gguf(gguf_path)
    finally:
        monkeypatch.setattr(jax, "jit", real_jit)
    assert "falling back" in capsys.readouterr().err
    for k in w_ref:
        if w_ref[k] is None or isinstance(w_ref[k], dict):
            continue
        assert np.array_equal(
            np.asarray(w_ref[k].astype(jnp.float32)),
            np.asarray(w_fb[k].astype(jnp.float32))), k


def test_generation_identical(gguf_path, monkeypatch):
    """Greedy generation through the full engine must not change."""
    from miotts_tpu.models.llm import LLMEngine
    from miotts_tpu.models.sampling import SamplerParams

    sp = SamplerParams(temp=0.0, top_k=1, seed=0)
    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "0")
    eng_h = LLMEngine(gguf_path)
    toks_h = eng_h.generate_audio_tokens("hello", n_predict=12, sampler=sp)
    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "1")
    eng_d = LLMEngine(gguf_path)
    toks_d = eng_d.generate_audio_tokens("hello", n_predict=12, sampler=sp)
    assert toks_h == toks_d


def test_single_block_tensor_reader_closes(tmp_path):
    """A quantized tensor with exactly ONE 32-element block must stage
    compact copies, not mmap views — ascontiguousarray returns a view for
    already-contiguous slices, and an escaped view makes reader.close()
    raise BufferError, failing the whole load."""
    from miotts_tpu.gguf.reader import GGUFReader
    from miotts_tpu.gguf.writer import GGUFWriter
    from miotts_tpu.runtime.device_dequant import PackedLoader

    path = str(tmp_path / "oneblock.gguf")
    w = GGUFWriter(path, arch="test")
    vals = (np.arange(32, dtype=np.float32) - 16.0) / 4.0
    w.add_tensor_q8_0("tiny", vals.reshape(1, 32))
    w.write()

    r = GGUFReader(path)
    pk = PackedLoader()
    assert pk.add_raw("tiny", r, ["tiny"], out_dtype=jnp.float32) is not None
    r.close()  # must not raise BufferError (exported mmap pointers)
    out = np.asarray(pk.finalize()["tiny"])
    q = np.round(vals / (np.abs(vals).max() / 127.0))
    scale = np.float32(np.float16(np.abs(vals).max() / 127.0))
    np.testing.assert_allclose(out, (q * scale).reshape(1, 32), rtol=1e-3)


def test_duplicate_leaf_key_rejected():
    from miotts_tpu.runtime.device_dequant import PackedLoader

    pk = PackedLoader()
    pk.add_array("k", np.ones(4, np.float32))
    with pytest.raises(AssertionError):
        pk.add_array("k", np.zeros(4, np.float32))


@pytest.mark.parametrize("quant_mode", ["", "int8_output_int4"])
def test_packed_deploy_artifact_roundtrip(gguf_path, monkeypatch, tmp_path,
                                          quant_mode):
    """The deploy artifact (packed groups + weight-tree spec on disk)
    replays to bit-identical leaves WITHOUT touching GGUF tensor payloads:
    the second load succeeds even with the tensor reader poisoned."""
    import miotts_tpu.models.llm as llm_mod
    from miotts_tpu.gguf import GGUFReader

    monkeypatch.setenv("MIOTTS_DEVICE_DEQUANT", "1")
    monkeypatch.setenv("MIOTTS_PACKED_CACHE", str(tmp_path / "packed"))
    cfg1, w1, _ = load_llm_gguf(gguf_path, quantize=quant_mode)
    arts = list((tmp_path / "packed").glob("*.packed.npz"))
    assert len(arts) == 1, arts

    real_tensor = GGUFReader.tensor

    def poisoned(self, name, dtype=None):
        raise AssertionError(
            f"artifact replay read tensor payload {name!r}")

    monkeypatch.setattr(GGUFReader, "tensor", poisoned)
    try:
        cfg2, w2, _ = load_llm_gguf(gguf_path, quantize=quant_mode)
    finally:
        monkeypatch.setattr(GGUFReader, "tensor", real_tensor)
    assert cfg1 == cfg2
    for k in w1:
        a, b = w1[k], w2[k]
        if a is None:
            assert b is None
            continue
        if isinstance(a, dict):
            assert set(a) == set(b)
            for sk in a:
                assert np.array_equal(np.asarray(a[sk]), np.asarray(b[sk])), (k, sk)
        else:
            assert a.dtype == b.dtype and np.array_equal(
                np.asarray(a.astype(jnp.float32)),
                np.asarray(b.astype(jnp.float32))), k
