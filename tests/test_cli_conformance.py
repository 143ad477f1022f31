"""CLI conformance suite mirroring the reference's 8 end-to-end scenarios
(tests/test_miotts-cli.sh): each checks exit code, output existence/size and
WAV validity. Uses synthetic models (the reference downloads real ones)."""

import struct

import numpy as np
import pytest

from miotts_tpu.cli import main
from miotts_tpu.gguf.writer import load_embedding_gguf, save_embedding_gguf
from miotts_tpu.runtime.audio_io import save_wav16
from miotts_tpu.testing import (
    tiny_codec_config, write_synthetic_llm_gguf, write_synthetic_miocodec_gguf,
    write_synthetic_wavlm_gguf,
)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cfg = tiny_codec_config(global_encoder_input_channels=32)
    codec = d / "codec.gguf"
    llm = d / "llm.gguf"
    wavlm = d / "wavlm.gguf"
    emb = d / "preset.emb.gguf"
    ref_wav = d / "ref.wav"
    write_synthetic_miocodec_gguf(str(codec), cfg, seed=0)
    write_synthetic_llm_gguf(str(llm), n_audio=cfg.vocab_size, seed=1)
    write_synthetic_wavlm_gguf(str(wavlm), seed=2)
    rng = np.random.RandomState(0)
    save_embedding_gguf(emb, rng.randn(cfg.decoder_adanorm_dim).astype(np.float32))
    sr = 24000
    save_wav16(ref_wav, (0.4 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32), sr)
    return d, cfg, str(codec), str(llm), str(wavlm), str(emb), str(ref_wav)


def _check_wav(path, min_bytes=100):
    data = path.read_bytes()
    assert len(data) >= min_bytes, f"{path} too small: {len(data)}"
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert struct.unpack_from("<H", data, 22)[0] == 1  # mono
    assert struct.unpack_from("<H", data, 34)[0] == 16  # 16-bit


def test_t1_t2_basic_synthesis(assets, tmp_path):
    """T1/T2: text synthesis with preset embedding (JP/EN)."""
    d, cfg, codec, llm, wavlm, emb, ref = assets
    for i, text in enumerate(["konnichiwa", "Hello world, this is a test."]):
        out = tmp_path / f"t1_{i}.wav"
        rc = main(["-mv", codec, "-m", llm, "-p", text, "-emb", emb,
                   "-o", str(out), "-n", "24"])
        assert rc == 0
        _check_wav(out)


def test_t3_reference_to_embedding_only(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    out_emb = tmp_path / "t3.emb.gguf"
    rc = main(["-mv", codec, "--tts-wavlm-model", wavlm,
               "--tts-reference-audio", ref,
               "--tts-mio-embedding-out", str(out_emb),
               "--tts-mio-embedding-only"])
    assert rc == 0
    e = load_embedding_gguf(out_emb)
    assert e.shape == (cfg.decoder_adanorm_dim,)
    assert np.isfinite(e).all()


def test_t4_synthesis_with_generated_embedding(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    out_emb = tmp_path / "t4.emb.gguf"
    rc = main(["-mv", codec, "--tts-wavlm-model", wavlm,
               "--tts-reference-audio", ref,
               "--tts-mio-embedding-out", str(out_emb), "--tts-mio-embedding-only"])
    assert rc == 0
    out = tmp_path / "t4.wav"
    rc = main(["-mv", codec, "-m", llm, "-p", "hello", "-n", "16",
               "--tts-mio-embedding-in", str(out_emb), "-o", str(out)])
    assert rc == 0
    _check_wav(out)


def test_t5_codes_only_dump(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    codes_out = tmp_path / "t5.codes.txt"
    rc = main(["-mv", codec, "-m", llm, "-p", "dump codes", "-n", "16",
               "--tts-mio-codes-out", str(codes_out), "--tts-mio-codes-only",
               "-emb", emb])
    assert rc == 0
    lines = codes_out.read_text().split()
    assert len(lines) >= 1
    assert all(0 <= int(x) < cfg.vocab_size for x in lines)


def test_t6_decode_from_codes_no_llm(assets, tmp_path):
    """T6: vocoder-only path — codes file in, no LLM loaded."""
    d, cfg, codec, llm, wavlm, emb, ref = assets
    codes_in = tmp_path / "t6.codes.txt"
    rng = np.random.RandomState(3)
    codes_in.write_text("\n".join(str(c) for c in rng.randint(0, cfg.vocab_size, 40)))
    out = tmp_path / "t6.wav"
    rc = main(["-mv", codec, "--tts-mio-codes-in", str(codes_in),
               "-emb", emb, "-o", str(out)])
    assert rc == 0
    _check_wav(out)
    # audio length = n_codes * samples_per_token
    data = out.read_bytes()
    n_samples = struct.unpack_from("<I", data, 40)[0] // 2
    assert n_samples == 40 * cfg.samples_per_token


def test_t6b_inline_codes_token_form(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    out = tmp_path / "t6b.wav"
    rc = main(["-mv", codec, "--tts-mio-codes", "<|s_1|>,<|s_2|>, 3 4 5,6",
               "-emb", emb, "-o", str(out)])
    assert rc == 0
    _check_wav(out)


def test_t7_long_text(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    out = tmp_path / "t7.wav"
    rc = main(["-mv", codec, "-m", llm, "-p", "long " * 30, "-n", "48",
               "-emb", emb, "-o", str(out)])
    assert rc == 0
    _check_wav(out)


def test_t8_reference_plus_synthesis_oneshot(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    out = tmp_path / "t8.wav"
    rc = main(["-mv", codec, "-m", llm, "-p", "cloned voice", "-n", "16",
               "--tts-wavlm-model", wavlm, "--tts-reference-audio", ref,
               "-o", str(out)])
    assert rc == 0
    _check_wav(out)


def test_stream_output_mode(assets, tmp_path):
    """--tts-stream-output (TPU addition): incremental WAV write during
    generation; the finished file is a normal, header-consistent WAV."""
    d, cfg, codec, llm, wavlm, emb, ref = assets
    out = tmp_path / "stream.wav"
    codes_out = tmp_path / "stream.codes.txt"
    rc = main(["-mv", codec, "-m", llm, "-p", "stream this text", "-n", "48",
               "-emb", emb, "-o", str(out), "--tts-stream-output",
               "--tts-mio-codes-out", str(codes_out)])
    assert rc == 0
    _check_wav(out)
    data = out.read_bytes()
    # sizes patched: RIFF size and data size consistent with the payload
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8
    assert struct.unpack_from("<I", data, 40)[0] == len(data) - 44
    assert codes_out.exists() and codes_out.read_text().strip()
    # requires a prompt + local LLM
    assert main(["-mv", codec, "--tts-stream-output", "-emb", emb,
                 "--tts-mio-codes", "1,2,3", "-o", str(tmp_path / "x.wav")]) == 1
    # --tts-mio-codes-only takes precedence: codes dumped, no synthesis
    co = tmp_path / "only.codes.txt"
    no_wav = tmp_path / "should-not-exist.wav"
    rc = main(["-mv", codec, "-m", llm, "-p", "dump only", "-n", "16",
               "-emb", emb, "-o", str(no_wav), "--tts-stream-output",
               "--tts-mio-codes-only", "--tts-mio-codes-out", str(co)])
    assert rc == 0
    assert co.exists() and not no_wav.exists()


def test_error_paths(assets, tmp_path):
    d, cfg, codec, llm, wavlm, emb, ref = assets
    # missing -mv
    assert main(["-p", "x"]) == 1
    # prompt without LLM
    assert main(["-mv", codec, "-p", "x", "-emb", emb]) == 1
    # dynamic codec requires embedding
    codes_in = tmp_path / "e.codes.txt"
    codes_in.write_text("1\n2\n")
    assert main(["-mv", codec, "--tts-mio-codes-in", str(codes_in)]) == 1
    # bad codes file
    bad = tmp_path / "bad.txt"
    bad.write_text("notacode\n")
    assert main(["-mv", codec, "--tts-mio-codes-in", str(bad), "-emb", emb]) == 1


def test_help_renders_both_surfaces():
    """argparse %-formats help strings at render time — an unescaped '%'
    in any help text crashes `--help` (found live: '24% off' in the
    server's --llm-quant help raised TypeError). Render both parsers."""
    from miotts_tpu.cli import build_parser
    from miotts_tpu.serving.server import build_arg_parser

    assert "--llm-quant" in build_parser().format_help()
    assert "--llm-quant" in build_arg_parser().format_help()
