"""GGUF reader/writer tests, incl. against the reference's bundled artifacts."""

import numpy as np
import pytest

from miotts_tpu.gguf import GGUFReader, GGMLType
from miotts_tpu.gguf.quants import dequantize
from miotts_tpu.gguf.writer import GGUFWriter, load_embedding_gguf, save_embedding_gguf

REF_EMB = "/root/reference/models/jp_female.emb.gguf"


def test_read_reference_embedding():
    with GGUFReader(REF_EMB) as r:
        assert r.kv["general.architecture"] == "mio-embedding"
        assert r.get_u32("mio.embedding.dim") == 128
        emb = r.tensor("mio.global_embedding")
        assert emb.shape == (128,)
        assert np.isfinite(emb).all()


def test_embedding_roundtrip(tmp_path):
    e = np.random.RandomState(7).randn(128).astype(np.float32)
    p = tmp_path / "x.emb.gguf"
    save_embedding_gguf(p, e)
    np.testing.assert_array_equal(load_embedding_gguf(p), e)
    with GGUFReader(p) as r:
        assert r.kv["general.architecture"] == "mio-embedding"
        assert r.get_u32("mio.embedding.dim") == 128


def test_writer_multitensor_alignment(tmp_path):
    w = GGUFWriter(tmp_path / "m.gguf", arch="test")
    a = np.arange(7, dtype=np.float32)
    b = np.random.RandomState(0).randn(3, 5).astype(np.float32)
    c = np.arange(6, dtype=np.int32).reshape(2, 3)
    w.add_uint32("k.u", 42)
    w.add_float32("k.f", 1.5)
    w.add_string("k.s", "hello")
    w.add_tensor("a", a)
    w.add_tensor("b", b)
    w.add_tensor("c", c)
    w.write()
    with GGUFReader(tmp_path / "m.gguf") as r:
        assert r.get_u32("k.u") == 42
        assert r.get_f32("k.f") == 1.5
        assert r.get_str("k.s") == "hello"
        np.testing.assert_array_equal(r.tensor("a"), a)
        np.testing.assert_array_equal(r.tensor("b"), b)
        np.testing.assert_array_equal(r.tensor("c"), c)
        assert r.tensors["b"].shape == (3, 5)


def test_q8_0_dequant():
    rng = np.random.RandomState(3)
    x = (rng.randn(4096) * 0.5).astype(np.float32)
    xb = x.reshape(-1, 32)
    amax = np.abs(xb).max(axis=1, keepdims=True)
    d16 = np.float16((amax / 127.0).astype(np.float32))
    q = np.round(xb / np.where(amax == 0, 1, amax) * 127.0).astype(np.int8)
    blocks = b"".join(d16[i, 0].tobytes() + q[i].tobytes() for i in range(xb.shape[0]))
    raw = np.frombuffer(blocks, dtype=np.uint8)
    y = dequantize(raw, GGMLType.Q8_0, 4096)
    # exactness: dequant must reproduce d_f16 * q bit-for-bit
    expect = (d16.astype(np.float32) * q).reshape(-1)
    np.testing.assert_array_equal(y, expect)


def test_f16_bf16_dequant():
    x = np.array([0.5, -1.25, 3.0, 65504.0], dtype=np.float32)
    raw16 = np.frombuffer(x.astype(np.float16).tobytes(), dtype=np.uint8)
    np.testing.assert_allclose(dequantize(raw16, GGMLType.F16, 4), x, rtol=1e-3)
    bf = ((x.view(np.uint32) + 0x8000) >> 16).astype(np.uint16)  # round-to-nearest
    rawbf = np.frombuffer(bf.tobytes(), dtype=np.uint8)
    np.testing.assert_allclose(dequantize(rawbf, GGMLType.BF16, 4), x, rtol=1e-2)
