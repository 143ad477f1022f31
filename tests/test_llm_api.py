"""External LLM API client tests against a local fake endpoint."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from miotts_tpu.runtime.llm_api import (
    extract_codes_from_text, extract_text_from_response,
    parse_codes_from_response,
)


def test_extract_codes_from_text():
    assert extract_codes_from_text("<|s_1|><|s_22|> and <|s_333|>") == [1, 22, 333]
    assert extract_codes_from_text("no codes here") == []


def test_parse_codes_ladder():
    assert parse_codes_from_response({"codes": [1, 2, 3]}) == [1, 2, 3]
    assert parse_codes_from_response({"codes_values": [4]}) == [4]
    assert parse_codes_from_response({"audio_codes": [5]}) == [5]
    assert parse_codes_from_response(
        {"choices": [{"message": {"content": "<|s_7|><|s_8|>"}}]}) == [7, 8]
    assert parse_codes_from_response(
        {"choices": [{"text": "<|s_9|>"}]}) == [9]
    assert parse_codes_from_response({"output_text": "<|s_10|>"}) == [10]
    with pytest.raises(ValueError):
        parse_codes_from_response({"choices": [{"message": {"content": "nope"}}]})


def test_extract_text_content_array():
    rsp = {"choices": [{"message": {"content": [
        {"type": "text", "text": "<|s_1|>"}, "<|s_2|>"]}}]}
    assert extract_codes_from_text(extract_text_from_response(rsp)) == [1, 2]


@pytest.fixture()
def fake_api():
    received = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            received["body"] = body
            received["auth"] = self.headers.get("Authorization")
            rsp = {"choices": [{"message": {"content": "<|s_3|><|s_1|><|s_4|>"}}]}
            data = json.dumps(rsp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions", received
    srv.shutdown()


def test_openai_chat_mode_request(fake_api):
    url, received = fake_api
    from miotts_tpu.runtime.llm_api import _build

    codes = _build(url, "secret", "some-model", "", 30, "openai-chat",
                   "say hi", 50, 0.7, 0.9, 40, 1.1, 7)
    assert codes == [3, 1, 4]
    body = received["body"]
    assert body["messages"] == [{"role": "user", "content": "say hi"}]
    assert body["max_tokens"] == 50 and body["model"] == "some-model"
    assert received["auth"] == "Bearer secret"


def test_generic_mode_request(fake_api):
    url, received = fake_api
    from miotts_tpu.runtime.llm_api import _build

    codes = _build(url, "", "", "", 30, "generic", "text in", 60, 0.8, 1.0, 50, 1.0, 0)
    assert codes == [3, 1, 4]
    body = received["body"]
    assert body["prompt"] == "text in" and body["n_predict"] == 60
    assert received["auth"] is None


def test_cli_external_api_end_to_end(fake_api, tmp_path):
    """CLI -p with --llm-api-url synthesizes via the external endpoint."""
    url, received = fake_api
    from miotts_tpu.cli import main
    from miotts_tpu.gguf.writer import save_embedding_gguf
    from miotts_tpu.testing import tiny_codec_config, write_synthetic_miocodec_gguf

    cfg = tiny_codec_config()
    codec = tmp_path / "codec.gguf"
    emb = tmp_path / "e.emb.gguf"
    write_synthetic_miocodec_gguf(str(codec), cfg, seed=0)
    save_embedding_gguf(emb, np.random.RandomState(0).randn(
        cfg.decoder_adanorm_dim).astype(np.float32))
    out = tmp_path / "api.wav"
    rc = main(["-mv", str(codec), "--llm-api-url", url, "-p", "hello",
               "-emb", str(emb), "-o", str(out)])
    assert rc == 0
    assert out.read_bytes()[:4] == b"RIFF"
