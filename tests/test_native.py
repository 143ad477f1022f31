"""Native runtime library vs numpy reference implementations."""

import numpy as np
import pytest

from miotts_tpu.runtime import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native runtime library unavailable (no compiler)")
    return True


def test_native_dequant_q8_0(lib_available):
    rng = np.random.RandomState(0)
    x = (rng.randn(8192) * 0.5).astype(np.float32)
    xb = x.reshape(-1, 32)
    amax = np.abs(xb).max(axis=1, keepdims=True)
    d16 = np.float16((amax / 127.0).astype(np.float32))
    q = np.round(xb / np.where(amax == 0, 1, amax) * 127.0).astype(np.int8)
    blocks = b"".join(d16[i, 0].tobytes() + q[i].tobytes() for i in range(xb.shape[0]))
    raw = np.frombuffer(blocks, dtype=np.uint8)

    got = native.dequantize_native(raw, 8, 8192)
    expect = (d16.astype(np.float32) * q).reshape(-1)
    np.testing.assert_array_equal(got, expect)


def test_native_dequant_f16_bf16(lib_available):
    rng = np.random.RandomState(1)
    x = (rng.randn(70000)).astype(np.float32)
    raw16 = np.frombuffer(x.astype(np.float16).tobytes(), np.uint8)
    got = native.dequantize_native(raw16, 1, 70000)
    np.testing.assert_array_equal(got, x.astype(np.float16).astype(np.float32))
    bf = (x.view(np.uint32) >> 16).astype(np.uint16)  # truncation is fine here
    got = native.dequantize_native(np.frombuffer(bf.tobytes(), np.uint8), 30, 70000)
    expect = (bf.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(got, expect)


def test_native_dequant_q6_k_matches_numpy(lib_available):
    from miotts_tpu.gguf.quants import _dequant_q6_k

    rng = np.random.RandomState(2)
    raw = rng.randint(0, 256, size=16 * 210, dtype=np.uint8)
    # keep the f16 scale finite
    for b in range(16):
        raw[b * 210 + 208:b * 210 + 210] = np.frombuffer(
            np.float16(0.01).tobytes(), np.uint8)
    got = native.dequantize_native(raw, 14, 16 * 256)
    expect = _dequant_q6_k(raw, 16 * 256)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_native_wav_encode_matches_numpy(lib_available):
    from miotts_tpu.runtime.audio_io import wav16_header

    rng = np.random.RandomState(3)
    audio = (rng.randn(1000) * 0.7).astype(np.float32)
    got = native.encode_wav16_native(audio, 24000)
    x = np.clip(audio, -1.0, 1.0)
    pcm = np.rint(x * 32767.0).astype(np.int16)
    expect = wav16_header(pcm.size, 24000) + pcm.tobytes()
    assert got == expect


def test_native_resample_matches_numpy(lib_available):
    from miotts_tpu.runtime.audio_io import resample_linear

    rng = np.random.RandomState(4)
    x = rng.randn(24000).astype(np.float32)
    got = native.resample_linear_native(x, 24000, 16000)
    expect = resample_linear(x, 24000, 16000)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_dequantize_dispatch_uses_native_for_large(lib_available):
    """gguf.dequantize must give identical results whether or not the
    native path kicks in."""
    import os

    from miotts_tpu.gguf.quants import dequantize

    rng = np.random.RandomState(5)
    n = 1 << 17
    x = (rng.randn(n) * 0.3).astype(np.float32)
    raw = np.frombuffer(x.astype(np.float16).tobytes(), np.uint8)
    a = dequantize(raw, 1, n)
    os.environ["MIOTTS_NO_NATIVE"] = "1"
    try:
        import miotts_tpu.runtime.native as nat

        old_lib, old_tried = nat._lib, nat._tried
        nat._lib, nat._tried = None, True
        b = dequantize(raw, 1, n)
        nat._lib, nat._tried = old_lib, old_tried
    finally:
        del os.environ["MIOTTS_NO_NATIVE"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_reference_bundled_wav():
    """Parse the reference repo's bundled real-world WAV resource."""
    import os
    from miotts_tpu.runtime.audio_io import load_audio

    path = "/root/reference/resources/ja_female.wav"
    if not os.path.exists(path):
        pytest.skip("reference resources not mounted")
    x, rate = load_audio(path)
    assert rate > 0 and x.size > 1000
    assert np.isfinite(x).all()
    assert np.abs(x).max() <= 1.0
    # resample to 16k for the WavLM path
    y, r2 = load_audio(path, target_rate=16000, max_seconds=2.0)
    assert r2 == 16000 and y.size == 32000


def test_log_mel_metric_sanity():
    from miotts_tpu.runtime.metrics import log_mel, mel_l1

    rng = np.random.RandomState(7)
    sr = 24000
    t = np.arange(sr) / sr
    a = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    m = log_mel(a, sr)
    assert m.ndim == 2 and m.shape[1] == 80
    assert np.isfinite(m).all()
    # identical signals -> 0; distinct tones -> clearly nonzero
    assert mel_l1(a, a, sr) == 0.0
    b = (0.5 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    assert mel_l1(a, b, sr) > 0.01
    # tiny noise -> tiny distance
    assert mel_l1(a + 1e-4 * rng.randn(sr).astype(np.float32), a, sr) < 0.05
