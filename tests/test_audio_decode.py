"""Self-contained reference-audio decode: FLAC (native C++ + pure-Python)
and the mp3 decoder chain — the last reference capability that previously
required an optional torchaudio install (wavlm-extractor.cpp:153-203
decodes wav/mp3/flac with miniaudio).

Fixture strategy: no FLAC/mp3 tooling exists in this sandbox, so FLAC
streams come from tests/flac_encoder.py (an independent spec
implementation) and mp3 fixtures are real files shipped inside other
packages in the image. pygame's SDL_mixer (dr_flac/dr_mp3) serves as a
third-party oracle where present."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from flac_encoder import encode_flac  # noqa: E402

from miotts_tpu.runtime.audio_io import load_audio  # noqa: E402
from miotts_tpu.runtime.flac import decode_flac  # noqa: E402
from miotts_tpu.runtime.native import flac_decode_native  # noqa: E402

MP3_FIXTURES = [
    p for p in (
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3",
    ) if Path(p).exists()
]


def _sdl_available() -> bool:
    try:
        import os

        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        import pygame  # noqa: F401

        return True
    except ImportError:
        return False


def _mono_sig(n, seed=0, sr=16000):
    rng = np.random.RandomState(seed)
    x = 8000 * np.sin(2 * np.pi * 440 * np.arange(n) / sr) + rng.randn(n) * 300
    return np.clip(x, -32768, 32767).astype(np.int64)


@pytest.mark.parametrize("kind", ["constant", "verbatim", "fixed0", "fixed1",
                                  "fixed2", "lpc2"])
def test_flac_roundtrip_subframe_kinds(kind):
    x = _mono_sig(9000, seed=1)
    if kind == "constant":
        x = np.full(9000, -1234, np.int64)
    data = encode_flac(x, 16000, subframe_kind=kind)
    got, rate = decode_flac(data)
    assert rate == 16000
    np.testing.assert_array_equal(got, (x / 32768.0).astype(np.float32))


@pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
@pytest.mark.parametrize("po", [0, 2])
def test_flac_roundtrip_stereo_modes(mode, po):
    l = _mono_sig(10000, seed=2, sr=22050)
    r = np.roll(l, 7)
    st = np.stack([l, r], 1)
    data = encode_flac(st, 22050, subframe_kind="fixed2", channel_mode=mode,
                       partition_order=po)
    got, rate = decode_flac(data)
    assert rate == 22050
    np.testing.assert_array_equal(
        got, (st.mean(axis=1) / 32768.0).astype(np.float32))


def test_flac_roundtrip_escape_and_wasted():
    x = (_mono_sig(5000, seed=3) >> 2) << 2  # multiples of 4: wasted=2
    d1 = encode_flac(x, 16000, subframe_kind="fixed1", wasted=2)
    got, _ = decode_flac(d1)
    np.testing.assert_array_equal(got, (x / 32768.0).astype(np.float32))
    d2 = encode_flac(x, 16000, subframe_kind="fixed2", partition_order=2,
                     escape_parts={1, 3})
    got, _ = decode_flac(d2)
    np.testing.assert_array_equal(got, (x / 32768.0).astype(np.float32))


def test_flac_native_matches_python():
    """The C++ decoder (mio_flac_decode) and the pure-Python decoder are
    independent implementations of the same spec — byte-identical output
    on an LPC + mid/side + partitioned stream with a short last frame."""
    l = _mono_sig(44100 * 2 + 57, seed=4, sr=44100)
    r = np.roll(l, 13)
    st = np.stack([l, r], 1)
    data = encode_flac(st, 44100, subframe_kind="lpc2",
                       channel_mode="mid_side", partition_order=3)
    res = flac_decode_native(data)
    if res is None:
        pytest.skip("native runtime library unavailable")
    xp, rp = decode_flac(data)
    assert res[1] == rp == 44100
    np.testing.assert_array_equal(res[0], xp)


@pytest.mark.skipif(not _sdl_available(), reason="pygame not installed")
def test_flac_third_party_oracle():
    """SDL_mixer's dr_flac decodes our encoder's output to the same
    samples our decoder produces (final sample excluded: SDL applies an
    endpoint declick that moves the very last sample one step toward
    zero — verified against VERBATIM streams where the bits are
    literal)."""
    import pygame
    import pygame.sndarray as sa

    l = _mono_sig(12345, seed=5, sr=44100)
    r = np.roll(l, 7)
    st = np.stack([l, r], 1)
    for mode in ("independent", "left_side", "mid_side"):
        data = encode_flac(st, 44100, subframe_kind="lpc2",
                           channel_mode=mode)
        p = Path("/tmp") / f"miotts_flac_oracle_{mode}.flac"
        p.write_bytes(data)
        init = pygame.mixer.get_init()
        if init is not None and int(init[0]) != 44100:
            # the mixer is process-global; an earlier test may have
            # re-inited it at another rate, which would SDL-resample here
            pygame.mixer.quit()
            init = None
        if init is None:
            pygame.mixer.init(frequency=44100, size=-16, channels=2)
        arr = sa.array(pygame.mixer.Sound(str(p))).astype(np.int64)
        assert arr.shape[0] == 12345
        np.testing.assert_array_equal(arr[:-1, 0], l[:-1], err_msg=mode)
        np.testing.assert_array_equal(arr[:-1, 1], r[:-1], err_msg=mode)


def test_load_audio_flac(tmp_path):
    x = _mono_sig(16000, seed=6)
    p = tmp_path / "ref.flac"
    p.write_bytes(encode_flac(x, 16000, subframe_kind="fixed2"))
    got, rate = load_audio(p)
    assert rate == 16000
    np.testing.assert_array_equal(got, (x / 32768.0).astype(np.float32))
    # resample + truncate plumbing
    got2, rate2 = load_audio(p, target_rate=8000, max_seconds=0.5)
    assert rate2 == 8000 and got2.size == 4000


@pytest.mark.skipif(not MP3_FIXTURES, reason="no mp3 fixture in image")
@pytest.mark.skipif(not _sdl_available(), reason="pygame not installed")
def test_load_audio_mp3_without_torchaudio(monkeypatch):
    """mp3 decode through the chain with torchaudio guaranteed absent
    (round-3 verdict item 5: the reference's miniaudio accepts mp3;
    our surface must too without optional installs)."""
    monkeypatch.setitem(sys.modules, "torchaudio", None)
    x, rate = load_audio(MP3_FIXTURES[0])
    assert rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                    44100, 48000)
    assert x.size > 1000 and np.isfinite(x).all()
    assert 1e-4 < np.abs(x).max() <= 1.0


@pytest.mark.skipif(not MP3_FIXTURES, reason="no mp3 fixture in image")
@pytest.mark.skipif(not _sdl_available(), reason="pygame not installed")
def test_mp3_reference_to_embedding(tmp_path, monkeypatch):
    """End-to-end voice-clone input: an mp3 reference produces a finite
    speaker embedding with torchaudio absent (matches
    wavlm-extractor.cpp:153-203 accepting mp3 uploads)."""
    monkeypatch.setitem(sys.modules, "torchaudio", None)
    from miotts_tpu.models.wavlm import WavLMExtractor
    from miotts_tpu.testing import write_synthetic_wavlm_gguf

    path = tmp_path / "wavlm.gguf"
    write_synthetic_wavlm_gguf(str(path), seed=2)
    ext = WavLMExtractor(str(path))
    ssl, n_frames = ext.extract_ssl_features(
        MP3_FIXTURES[0], source_rate=24000, max_seconds=2.0)
    assert n_frames > 0
    assert np.isfinite(ssl).all()


def test_mp3_info_header_parse(tmp_path):
    from miotts_tpu.runtime.audio_io import _mp3_info

    if MP3_FIXTURES:
        info = _mp3_info(Path(MP3_FIXTURES[0]).read_bytes())
        assert info is not None
        rate, ch = info
        assert rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                        44100, 48000)
        assert ch in (1, 2)
    # ID3v2 skip: tag then an MPEG1 layer III 44.1 kHz stereo header
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    assert _mp3_info(tag + hdr) == (44100, 2)
    assert _mp3_info(b"\x00" * 64) is None
