"""Native C client bridge (bindings/native/mio_tpu_client.cpp) end-to-end
against a live server — the device-app integration surface (reference
bridges: MioTTSLocalBridge.h:11-92, mio_tts_android_jni.cpp:73-425)."""

import json
import math
import shutil
import struct

import numpy as np
import pytest

from miotts_tpu.gguf.writer import save_embedding_gguf
from miotts_tpu.serving.server import MioTTSServer
from miotts_tpu.serving.state import ServerConfig
from miotts_tpu.testing import (
    tiny_codec_config, write_synthetic_llm_gguf, write_synthetic_miocodec_gguf,
    write_synthetic_wavlm_gguf,
)

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("clang++") is None,
    reason="no C++ compiler")


@pytest.fixture(scope="module")
def bridge_server(tmp_path_factory):
    d = tmp_path_factory.mktemp("bridge")
    cfg_codec = tiny_codec_config(global_encoder_input_channels=32)
    write_synthetic_miocodec_gguf(str(d / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(d / "llm.gguf"), n_audio=cfg_codec.vocab_size, seed=1)
    write_synthetic_wavlm_gguf(str(d / "wavlm.gguf"), seed=2)
    rng = np.random.RandomState(0)
    save_embedding_gguf(d / "voice.emb.gguf",
                        rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))
    cfg = ServerConfig(
        model_vocoder=str(d / "codec.gguf"), model=str(d / "llm.gguf"),
        wavlm_model=str(d / "wavlm.gguf"), host="127.0.0.1", port=0,
        output_dir=str(d / "out"), n_parallel=2, n_predict=16, n_ctx=128,
        reference_file_json=json.dumps(
            {"key": "preset", "path": str(d / "voice.emb.gguf")}),
    )
    srv = MioTTSServer(cfg)
    srv.start_background()
    yield srv, d
    srv.shutdown()


def _make_wav(path, seconds=1.0, sr=16000):
    n = int(sr * seconds)
    pcm = b"".join(
        struct.pack("<h", int(8000 * math.sin(2 * math.pi * 180 * i / sr)))
        for i in range(n))
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " +
           struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) +
           b"data" + struct.pack("<I", len(pcm)) + pcm)
    path.write_bytes(wav)


def test_bridge_end_to_end(bridge_server, tmp_path):
    from miotts_tpu.bindings import MioTPUClient

    srv, d = bridge_server
    with MioTPUClient(f"http://127.0.0.1:{srv.port}") as c:
        h = json.loads(c.health_json())
        assert h["status"] == "ok"

        # voice clone through the bridge (multipart upload, gguf download)
        _make_wav(tmp_path / "voice.wav")
        c.create_reference_from_audio(
            "bridge_voice", str(tmp_path / "voice.wav"),
            max_reference_seconds=5.0,
            embedding_out_path=str(tmp_path / "bridge.emb.gguf"))
        assert (tmp_path / "bridge.emb.gguf").read_bytes()[:4] == b"GGUF"
        c.add_reference_from_gguf("bridge_copy", str(tmp_path / "bridge.emb.gguf"))
        keys = [r["key"] for r in
                json.loads(c.list_references_json())["references"]]
        assert {"preset", "bridge_voice", "bridge_copy"} <= set(keys)

        # text -> wav (UTF-8 + JSON escaping through the C layer)
        c.set_generation_params(n_predict=12, top_k=40, top_p=0.95,
                                temp=0.7, seed=3)
        out = tmp_path / "tts.wav"
        c.synthesize_to_wav('こんにちは、"テスト"です。\n', "bridge_voice", str(out))
        assert out.read_bytes()[:4] == b"RIFF"

        # codes -> wav (chunked-WAV decode in the C client)
        out2 = tmp_path / "codes.wav"
        c.synthesize_codes_to_wav([1, 2, 3, 4, 5, 6, 7, 8], "preset", str(out2))
        data = out2.read_bytes()
        assert data[:4] == b"RIFF" and len(data) > 44

        c.remove_reference("bridge_voice")
        c.remove_reference("bridge_copy")
        keys = [r["key"] for r in
                json.loads(c.list_references_json())["references"]]
        assert "bridge_voice" not in keys


def test_bridge_error_paths(bridge_server, tmp_path):
    from miotts_tpu.bindings import MioTPUClient

    srv, _ = bridge_server
    with pytest.raises(ConnectionError):
        MioTPUClient("http://127.0.0.1:9")  # nothing listens on port 9
    with pytest.raises(ConnectionError):
        MioTPUClient("ftp://bad.scheme")

    with MioTPUClient(f"http://127.0.0.1:{srv.port}") as c:
        with pytest.raises(RuntimeError, match="not found"):
            c.synthesize_to_wav("x", "no_such_ref", str(tmp_path / "x.wav"))
        with pytest.raises(RuntimeError, match="not found"):
            c.remove_reference("never_existed")
        with pytest.raises(RuntimeError, match="cannot open file"):
            c.add_reference_from_gguf("k", str(tmp_path / "missing.gguf"))
