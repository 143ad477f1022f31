"""Request-JSON parsing conformance (parse_request_json,
tts-mio-server.cpp:2036-2151): field aliases, defaults, clamps, errors."""

import pytest

from miotts_tpu.serving.state import (
    RequestError, ServerConfig, is_valid_reference_key, parse_request_json,
)

CFG = ServerConfig(model_vocoder="x.gguf", n_ctx=700, n_predict=700,
                   temp=0.8, top_k=50, top_p=1.0)


def test_text_aliases():
    for key in ("text", "prompt", "input"):
        rp = parse_request_json({key: "hi", "reference_key": "k"}, CFG)
        assert rp.text == "hi"
    # precedence: text > prompt > input
    rp = parse_request_json({"text": "a", "prompt": "b", "input": "c",
                             "reference_key": "k"}, CFG)
    assert rp.text == "a"


def test_reference_key_aliases():
    for key in ("reference_key", "tts_reference_key", "key"):
        rp = parse_request_json({"text": "x", key: "voice1"}, CFG)
        assert rp.reference_key == "voice1"


def test_defaults_from_config():
    rp = parse_request_json({"text": "x", "reference_key": "k"}, CFG)
    assert rp.temp == 0.8 and rp.top_k == 50 and rp.n_predict == 700
    assert rp.max_reference_seconds == 20.0


def test_overrides_and_clamps():
    rp = parse_request_json({"text": "x", "reference_key": "k",
                             "temp": 0.3, "top_k": 10, "n_predict": 9999}, CFG)
    assert rp.temp == 0.3 and rp.top_k == 10
    assert rp.n_predict == 700  # clamped to cfg.n_predict and cfg.n_ctx


def test_n_ctx_exceeds_preallocated():
    with pytest.raises(RequestError, match="n_ctx exceeds preallocated"):
        parse_request_json({"text": "x", "reference_key": "k", "n_ctx": 9999}, CFG)
    with pytest.raises(RequestError, match="n_ctx must be >= 1"):
        parse_request_json({"text": "x", "reference_key": "k", "n_ctx": 0}, CFG)
    with pytest.raises(RequestError, match="n_predict must be >= 1"):
        parse_request_json({"text": "x", "reference_key": "k", "n_predict": 0}, CFG)


def test_synthesis_requires_reference_key():
    with pytest.raises(RequestError, match="synthesis requires reference_key"):
        parse_request_json({"text": "x"}, CFG)
    # codes_only does not require it
    rp = parse_request_json({"text": "x", "codes_only": True}, CFG)
    assert rp.codes_only


def test_reference_key_charset():
    assert is_valid_reference_key("ab_C-1.2")
    assert not is_valid_reference_key("")
    assert not is_valid_reference_key("a" * 129)
    assert not is_valid_reference_key("bad key")
    assert not is_valid_reference_key("dir/../escape")
    with pytest.raises(RequestError, match="reference_key is invalid"):
        parse_request_json({"text": "x", "reference_key": "no spaces"}, CFG)


def test_inline_codes_forms():
    rp = parse_request_json({"codes": [1, 2, "3", "<|s_4|>"],
                             "reference_key": "k"}, CFG)
    assert rp.inline_codes == [1, 2, 3, 4]
    with pytest.raises(RequestError, match="code id out of range"):
        parse_request_json({"codes": [99999], "reference_key": "k"}, CFG)
    with pytest.raises(RequestError):
        parse_request_json({"codes": "notalist", "reference_key": "k"}, CFG)


def test_embedding_only_requires_source():
    with pytest.raises(RequestError, match="embedding_only requires"):
        parse_request_json({"embedding_only": True}, CFG)
    rp = parse_request_json({"embedding_only": True, "embedding_in": "e.gguf"}, CFG)
    assert rp.embedding_only


def test_stream_tokens_blocked_with_external_api():
    cfg = ServerConfig(model_vocoder="x", llm_api_url="http://api")
    with pytest.raises(RequestError, match="stream_tokens is not supported"):
        parse_request_json({"text": "x", "reference_key": "k",
                            "stream_tokens": True}, cfg)
