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


def test_q4_k_dequant_crafted_block():
    """Hand-constructed Q4_K super-block: d=1, dmin=0, 6-bit scales
    [1,1,1,1,0,0,0,0], mins 0 -> outputs 0..127 are the raw nibbles
    (lo 32 then hi 32 per 64-group), outputs 128..255 are 0."""
    rng = np.random.RandomState(0)
    qs = rng.randint(0, 256, 128, dtype=np.uint8)
    block = bytearray()
    block += np.float16(1.0).tobytes()   # d
    block += np.float16(0.0).tobytes()   # dmin
    scales = bytearray(12)
    scales[0:4] = bytes([1, 1, 1, 1])    # sc[0..3] = 1 (and q[j]>>6 == 0)
    block += bytes(scales)               # mins and sc[4..7] zero
    block += qs.tobytes()
    raw = np.frombuffer(bytes(block), np.uint8)
    out = dequantize(raw, GGMLType.Q4_K, 256)
    expect = np.zeros(256, np.float32)
    for j in range(2):  # groups with sc=1
        b = qs[j * 32:(j + 1) * 32]
        expect[j * 64:j * 64 + 32] = (b & 0x0F).astype(np.float32)
        expect[j * 64 + 32:j * 64 + 64] = (b >> 4).astype(np.float32)
    np.testing.assert_allclose(out, expect)


def test_q5_k_dequant_crafted_block():
    """Q5_K with qh bits set for the first group adds +16 to its values."""
    rng = np.random.RandomState(1)
    qs = rng.randint(0, 256, 128, dtype=np.uint8)
    block = bytearray()
    block += np.float16(1.0).tobytes()
    block += np.float16(0.0).tobytes()
    scales = bytearray(12)
    scales[0] = 1  # only sc[0] = 1 -> only outputs 0..31 nonzero
    block += bytes(scales)
    qh = np.zeros(32, np.uint8)
    qh[:16] = 1  # u1=1 bit set for first 16 positions of group 0
    block += qh.tobytes()
    block += qs.tobytes()
    raw = np.frombuffer(bytes(block), np.uint8)
    out = dequantize(raw, GGMLType.Q5_K, 256)
    expect = np.zeros(256, np.float32)
    lo = (qs[:32] & 0x0F).astype(np.float32)
    lo[:16] += 16.0
    expect[:32] = lo
    np.testing.assert_allclose(out, expect)
