"""HTTP server conformance tests against the reference's /mio/* surface."""

import base64
import json
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from miotts_tpu.gguf.writer import save_embedding_gguf
from miotts_tpu.runtime.audio_io import save_wav16
from miotts_tpu.serving.server import MioTTSServer
from miotts_tpu.serving.state import ServerConfig
from miotts_tpu.testing import (
    tiny_codec_config, write_synthetic_llm_gguf, write_synthetic_miocodec_gguf,
    write_synthetic_wavlm_gguf,
)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    codec = d / "codec.gguf"
    llm = d / "llm.gguf"
    wavlm = d / "wavlm.gguf"
    emb_path = d / "voice.emb.gguf"
    cfg_codec = tiny_codec_config(global_encoder_input_channels=32)
    write_synthetic_miocodec_gguf(str(codec), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(llm), n_audio=cfg_codec.vocab_size, seed=1)
    write_synthetic_wavlm_gguf(str(wavlm), seed=2)
    rng = np.random.RandomState(0)
    save_embedding_gguf(emb_path, rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))

    cfg = ServerConfig(
        model_vocoder=str(codec), model=str(llm), wavlm_model=str(wavlm),
        host="127.0.0.1", port=0, output_dir=str(d / "out"),
        reference_added_output_dir=str(d / "refs"),
        n_parallel=2, n_predict=32, n_ctx=128,
        reference_file_json=json.dumps({"key": "preset", "path": str(emb_path)}),
    )
    srv = MioTTSServer(cfg)
    srv.start_background()
    yield srv, d, emb_path, cfg_codec
    srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.port}{path}"


def _post_json(srv, path, obj, headers=None):
    req = urllib.request.Request(
        _url(srv, path), data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json", **(headers or {})})
    return urllib.request.urlopen(req, timeout=120)


def test_health(server):
    srv, *_ = server
    with urllib.request.urlopen(_url(srv, "/mio/health"), timeout=30) as r:
        j = json.loads(r.read())
    assert j["status"] == "ok"
    assert j["parallel"] == 2
    assert j["reference_generation_enabled"] is True
    assert j["reference_cache"] >= 1
    assert "llm_shared_context" in j and "external_llm_enabled" in j


def test_references_list(server):
    srv, *_ = server
    with urllib.request.urlopen(_url(srv, "/mio/references"), timeout=30) as r:
        j = json.loads(r.read())
    assert j["ok"] is True
    keys = [e["key"] for e in j["references"]]
    assert "preset" in keys


def test_tts_with_inline_codes(server):
    srv, d, *_ = server
    codes = list(range(24))
    with _post_json(srv, "/mio/tts", {"codes": codes, "reference_key": "preset"}) as r:
        j = json.loads(r.read())
    assert j["ok"] is True
    assert j["mode"] == "synthesis"
    assert j["codes"] == 24
    assert j["sample_rate"] == 24000
    assert j["n_audio"] > 0
    assert "output_file" in j and j["output_file"].endswith(".wav")
    assert "slot" in j


def test_tts_stream_binary(server):
    srv, *_ = server
    with _post_json(srv, "/mio/tts/stream",
                    {"codes": [1, 2, 3, 4, 5, 6, 7, 8], "reference_key": "preset"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert r.headers["X-Reference-Key"] == "preset"
        assert int(r.headers["X-Sample-Rate"]) == 24000
        data = r.read()
    assert data[:4] == b"RIFF"
    assert int(r.headers["X-Audio-Samples"]) * 2 + 44 == len(data)


def test_tts_text_via_llm(server):
    srv, *_ = server
    with _post_json(srv, "/v1/audio/speech",
                    {"text": "hello world", "reference_key": "preset",
                     "n_predict": 16}) as r:
        j = json.loads(r.read())
    assert j["ok"] is True
    assert j["codes"] > 0
    assert "llm_ms" in j


def test_tts_sse_stream_tokens(server):
    srv, *_ = server
    with _post_json(srv, "/mio/tts/stream",
                    {"text": "hi", "reference_key": "preset",
                     "stream_tokens": True, "n_predict": 12}) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        body = r.read().decode()
    events = {}
    order = []
    for block in body.strip().split("\n\n"):
        lines = block.split("\n")
        ev = next((l[7:] for l in lines if l.startswith("event: ")), None)
        data = next((l[6:] for l in lines if l.startswith("data: ")), None)
        if ev:
            events.setdefault(ev, []).append(data)
            order.append(ev)
    assert "token" in events
    tok0 = json.loads(events["token"][0])
    assert "id" in tok0 and tok0["i"] == 0
    assert "generation_complete" in events
    gc = json.loads(events["generation_complete"][0])
    assert gc["n_codes"] > 0 and "llm_ms" in gc
    meta = json.loads(events["audio_meta"][0])
    assert meta["sample_rate"] == 24000 and meta["wav_size"] > 44
    wav = base64.b64decode(events["audio_data"][0])
    assert wav[:4] == b"RIFF" and len(wav) == meta["wav_size"]
    assert order.index("generation_complete") < order.index("audio_meta") < order.index("audio_data")


def test_error_shape_and_missing_reference(server):
    srv, *_ = server
    try:
        _post_json(srv, "/mio/tts", {"codes": [1, 2], "reference_key": "nope"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        j = json.loads(e.read())
        assert j["ok"] is False
        assert j["error"]["code"] == 400
        assert "reference_key not found" in j["error"]["message"]

    # synthesis without reference_key is rejected at parse time
    try:
        _post_json(srv, "/mio/tts", {"codes": [1, 2]})
        assert False
    except urllib.error.HTTPError as e:
        assert "synthesis requires reference_key" in json.loads(e.read())["error"]["message"]


def test_codes_only(server):
    srv, *_ = server
    with _post_json(srv, "/mio/tts", {"codes": [5, 6, 7], "codes_only": True,
                                      "reference_key": "preset"}) as r:
        j = json.loads(r.read())
    assert j["ok"] is True
    assert j["mode"] == "codes-only"
    assert j["codes_values"] == [5, 6, 7]


def test_generate_reference_multipart_and_synthesis(server, tmp_path):
    srv, d, emb_path, cfg_codec = server
    sr = 24000
    audio = (0.4 * np.sin(2 * np.pi * 330 * np.arange(sr) / sr)).astype(np.float32)
    wav_path = tmp_path / "voice.wav"
    save_wav16(wav_path, audio, sr)
    wav_bytes = wav_path.read_bytes()

    boundary = "----miotestboundary"
    parts = []
    parts.append(f'--{boundary}\r\nContent-Disposition: form-data; name="reference_key"\r\n\r\ncloned1\r\n')
    parts.append(f'--{boundary}\r\nContent-Disposition: form-data; name="audio"; filename="voice.wav"\r\n'
                 'Content-Type: audio/wav\r\n\r\n')
    body = "".join(parts).encode() + wav_bytes + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        _url(srv, "/mio/generate_reference"), data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["X-Reference-Key"] == "cloned1"
        dim = int(r.headers["X-Embedding-Dim"])
        payload = r.read()
    assert dim == cfg_codec.decoder_adanorm_dim
    assert payload[:4] == b"GGUF"
    # saved to reference-added-output-dir
    assert (d / "refs" / "cloned1.emb.gguf").exists()

    # now usable as reference_key
    with _post_json(srv, "/mio/tts", {"codes": [1, 2, 3, 4], "reference_key": "cloned1"}) as r:
        assert json.loads(r.read())["ok"] is True


_MP3_FIXTURE = next((p for p in (
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3",
) if Path(p).exists()), None)


@pytest.mark.skipif(_MP3_FIXTURE is None, reason="no mp3 fixture in image")
def test_generate_reference_mp3_upload(server, monkeypatch):
    """An mp3 reference upload produces an embedding with torchaudio
    absent — the decode chain (runtime/audio_io.py) covers what the
    reference's miniaudio accepts (wavlm-extractor.cpp:153-203)."""
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "torchaudio", None)
    srv, d, emb_path, cfg_codec = server
    mp3_bytes = Path(_MP3_FIXTURE).read_bytes()
    boundary = "----miomp3boundary"
    parts = [
        f'--{boundary}\r\nContent-Disposition: form-data; '
        'name="reference_key"\r\n\r\nmp3clone\r\n',
        f'--{boundary}\r\nContent-Disposition: form-data; name="audio"; '
        'filename="voice.mp3"\r\nContent-Type: audio/mpeg\r\n\r\n',
    ]
    body = "".join(parts).encode() + mp3_bytes \
        + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        _url(srv, "/mio/generate_reference"), data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=180) as r:
        assert r.headers["X-Reference-Key"] == "mp3clone"
        payload = r.read()
    assert payload[:4] == b"GGUF"
    with _post_json(srv, "/mio/tts", {"codes": [1, 2, 3],
                                      "reference_key": "mp3clone"}) as r:
        assert json.loads(r.read())["ok"] is True


def test_add_and_delete_reference(server, tmp_path):
    srv, d, emb_path, cfg_codec = server
    with _post_json(srv, "/mio/add_reference",
                    {"key": "added1", "path": str(emb_path)}) as r:
        j = json.loads(r.read())
    assert j["ok"] is True and j["mode"] == "add-reference"
    assert j["embedding_dim"] == cfg_codec.decoder_adanorm_dim

    with _post_json(srv, "/mio/delete_reference", {"key": "added1"}) as r:
        j = json.loads(r.read())
    assert j["ok"] is True and j["removed"] is True

    try:
        _post_json(srv, "/mio/delete_reference", {"key": "added1"})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_parallel_requests(server):
    srv, *_ = server
    import concurrent.futures

    def one(i):
        with _post_json(srv, "/mio/tts",
                        {"codes": list(range(8 + i)), "reference_key": "preset"}) as r:
            return json.loads(r.read())

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(6)))
    assert all(j["ok"] for j in results)
    assert {j["slot"] for j in results} <= {0, 1}


def test_connect_burst_not_refused(server):
    """A connect burst wider than the stdlib's default listen backlog (5)
    must not get connections refused: at --concurrency 32 (the reference
    perf harness's top sweep level, tests/test_performance.sh:11-14) the
    accept queue overflowed and 2/64 requests failed before any handler
    ran. The server raises request_queue_size; every connection in a
    64-wide simultaneous burst must be served."""
    srv, *_ = server
    import concurrent.futures
    import threading

    assert srv.httpd.request_queue_size >= 64

    barrier = threading.Barrier(64)

    def one(i):
        barrier.wait()  # all 64 connects land at once
        with urllib.request.urlopen(_url(srv, "/mio/health"), timeout=60) as r:
            return json.loads(r.read())["status"]

    with concurrent.futures.ThreadPoolExecutor(64) as ex:
        results = list(ex.map(one, range(64)))
    assert results == ["ok"] * 64


def test_multipart_binary_payload_with_crlf_tail():
    """Uploaded binary parts ending in \\r/\\n bytes must not be corrupted
    (the framing CRLF is exactly one trailing sequence)."""
    from miotts_tpu.serving.server import _parse_multipart

    payload = bytes(range(256)) + b"\n\r\n"  # data legitimately ends 0x0A 0x0D 0x0A
    boundary = "XYZ"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="audio"; filename="a.bin"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n").encode()
    body += payload + f"\r\n--{boundary}--\r\n".encode()
    fields, files = _parse_multipart(
        f'multipart/form-data; boundary={boundary}', body)
    assert files["audio"][1] == payload


def test_web_ui_assets(server):
    """UI page + assets served with correct types (tts-mio-server.cpp:3156-3172
    route parity; content is our own thin-client app, serving/webui.py)."""
    srv, *_ = server
    with urllib.request.urlopen(_url(srv, "/"), timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/html")
        page = r.read().decode()
    # the page must reference both assets and expose the main controls
    assert "/mio-ui.css" in page and "/mio-ui.js" in page
    for elem in ("btn-generate", "btn-gen-ref", "btn-add-ref", "ref-select",
                 "btn-rec-start", "p-n-predict"):
        assert elem in page, elem
    with urllib.request.urlopen(_url(srv, "/mio-ui.css"), timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/css")
        assert len(r.read()) > 100
    with urllib.request.urlopen(_url(srv, "/mio-ui.js"), timeout=30) as r:
        assert r.headers["Content-Type"].startswith("application/javascript")
        body = r.read().decode()
    # the JS drives the real endpoints
    for route in ("/mio/tts/stream", "/mio/generate_reference",
                  "/mio/add_reference", "/mio/delete_reference", "/mio/references"):
        assert route in body, route


def test_metrics_endpoint(server):
    """GET /metrics: Prometheus text exposition of serving counters
    (observability the reference lacks)."""
    srv, *_ = server
    # serve one request so totals are non-zero
    with _post_json(srv, "/mio/tts/stream",
                    {"codes": [1, 2, 3, 4], "reference_key": "preset"}) as r:
        r.read()
    with urllib.request.urlopen(_url(srv, "/metrics"), timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE miotts_requests_total counter" in body
    lines = dict(l.split(" ", 1) for l in body.splitlines()
                 if l and not l.startswith("#"))
    assert float(lines["miotts_requests_total"]) >= 1
    assert float(lines["miotts_audio_seconds_total"]) > 0
    assert float(lines["miotts_reference_cache_size"]) >= 1
    assert float(lines["miotts_inflight"]) == 0
    # stall observability (server fixture has an LLM configured)
    assert float(lines["miotts_device_stall_events_total"]) == 0
    assert "miotts_longest_chunk_fetch_seconds" in lines


def test_body_size_cap_413(server):
    srv, *_ = server
    req = urllib.request.Request(
        _url(srv, "/mio/tts"), data=b"{}",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(300 * 1024 * 1024)})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 413"
    except urllib.error.HTTPError as e:
        assert e.code == 413
        j = json.loads(e.read())
        assert "too large" in j["error"]["message"]


def test_slot_pool_timeout_503():
    from miotts_tpu.serving.engine import SlotPool
    from miotts_tpu.serving.state import RequestError

    pool = SlotPool(2)
    a, b = pool.acquire(), pool.acquire()
    with pytest.raises(RequestError) as ei:
        pool.acquire(timeout=0.05)
    assert ei.value.code == 503
    pool.release(a)
    assert pool.acquire(timeout=1.0) == a  # frees propagate
    pool.release(b)


def test_ui_js_structure_sane():
    """No JS engine exists in this image, so guard the embedded UI script
    against gross syntax damage: balanced brackets outside strings/comments
    and terminated string literals."""
    from miotts_tpu.serving.webui import UI_JS

    pairs = {")": "(", "]": "[", "}": "{"}
    stack = []
    i, n = 0, len(UI_JS)
    while i < n:
        c = UI_JS[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n and UI_JS[i] != q:
                if UI_JS[i] == "\\":
                    i += 1
                i += 1
            assert i < n, f"unterminated {q} string"
        elif c == "/" and i + 1 < n and UI_JS[i + 1] == "/":
            while i < n and UI_JS[i] != "\n":
                i += 1
        elif c in "([{":
            stack.append(c)
        elif c in ")]}":
            assert stack and stack[-1] == pairs[c], f"mismatched {c} at {i}"
            stack.pop()
        i += 1
    assert not stack, f"unclosed {stack}"


def test_delete_reference_restful_alias(server, tmp_path):
    """DELETE /mio/references/:key — the form the reference README advertises
    but its code never registers (SURVEY §7 step 7); we serve both."""
    srv, d, emb_path, _ = server
    _post_json(srv, "/mio/add_reference",
               {"reference_key": "rest_del", "path": str(emb_path)}).read()
    req = urllib.request.Request(_url(srv, "/mio/references/rest_del"),
                                 method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as r:
        j = json.loads(r.read())
    assert j["ok"] and j["reference_key"] == "rest_del" and j["removed"]
    # unknown key -> 404; unknown path shape -> 404
    for path in ("/mio/references/rest_del", "/mio/unknown/shape"):
        req = urllib.request.Request(_url(srv, path), method="DELETE")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404


def _parse_sse(body: str):
    events, order = {}, []
    for block in body.strip().split("\n\n"):
        lines = block.split("\n")
        ev = next((l[7:] for l in lines if l.startswith("event: ")), None)
        data = next((l[6:] for l in lines if l.startswith("data: ")), None)
        if ev:
            events.setdefault(ev, []).append(data)
            order.append(ev)
    return events, order


def test_tts_sse_stream_audio(server):
    """stream_audio=true on the SSE path: incremental PCM arrives as
    audio_chunk events BEFORE generation completes (BASELINE config 4 made
    public — the reference only sends audio after full synthesis)."""
    srv, *_ = server
    # "x" is chosen so the synthetic LLM emits enough audio codes before its
    # 32-token budget that the first chunk stabilizes mid-generation
    with _post_json(srv, "/mio/tts/stream",
                    {"text": "x", "reference_key": "preset",
                     "stream_tokens": True, "stream_audio": True,
                     "n_predict": 48}) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        body = r.read().decode()
    events, order = _parse_sse(body)
    assert "token" in events
    assert "audio_chunk" in events, order
    assert "generation_complete" in events
    # audio streamed while tokens were still being produced
    assert order.index("audio_chunk") < order.index("generation_complete")
    meta = json.loads(events["audio_meta"][0])
    assert meta["streamed"] is True and meta["sample_rate"] == 24000
    # reassembled chunks == n_audio samples, seq is contiguous
    total = 0
    for i, raw in enumerate(events["audio_chunk"]):
        c = json.loads(raw)
        assert c["seq"] == i
        pcm = base64.b64decode(c["pcm16"])
        assert len(pcm) == 2 * c["n_samples"]
        total += c["n_samples"]
    assert total == meta["n_audio"] > 0
    assert "audio_data" not in events  # chunks replace the monolithic blob


def test_tts_binary_stream_audio(server):
    """stream_audio=true without stream_tokens: chunked streaming WAV whose
    header carries the unknown-length convention and whose PCM reassembles
    to a playable mono stream."""
    import struct

    srv, *_ = server
    with _post_json(srv, "/mio/tts/stream",
                    {"text": "hello binary stream", "reference_key": "preset",
                     "stream_audio": True, "n_predict": 24}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert r.headers["X-Audio-Streaming"] == "1"
        assert int(r.headers["X-Sample-Rate"]) == 24000
        data = r.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    riff_size, = struct.unpack_from("<I", data, 4)
    data_size, = struct.unpack_from("<I", data, 40)
    assert riff_size == 0xFFFFFFFF and data_size == 0xFFFFFFFF
    assert (len(data) - 44) % 2 == 0 and len(data) > 44


def test_tts_binary_stream_audio_inline_codes(server):
    """Streaming delivery also works for pre-supplied codes (chunked feed)."""
    srv, *_ = server
    with _post_json(srv, "/mio/tts/stream",
                    {"codes": list(range(40)), "reference_key": "preset",
                     "stream_audio": True}) as r:
        assert r.headers["X-Audio-Streaming"] == "1"
        data = r.read()
    assert data[:4] == b"RIFF" and len(data) > 44


def test_tts_overlap_synthesis_json(server):
    """overlap_synthesis=true on a non-streaming text request: generation
    and codec prefix re-decodes interleave, the response is the ordinary
    JSON-with-output-file contract."""
    srv, *_ = server
    with _post_json(srv, "/mio/tts",
                    {"text": "overlap me", "reference_key": "preset",
                     "n_predict": 24, "overlap_synthesis": True}) as r:
        j = json.loads(r.read())
    assert j["ok"] is True
    assert j["mode"] == "synthesis_overlap"
    assert j["codes"] > 0 and j["n_audio"] > 0
    assert "llm_ms" in j and "synth_ms" in j
    assert j["output_file"].endswith(".wav")


def test_tts_overlap_synthesis_binary(server):
    """Same on the binary route: a complete (non-streamed) WAV body."""
    srv, *_ = server
    with _post_json(srv, "/mio/tts/stream",
                    {"text": "overlap binary", "reference_key": "preset",
                     "n_predict": 24, "overlap_synthesis": True}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    assert data[:4] == b"RIFF"
    assert int(r.headers["X-Audio-Samples"]) * 2 + 44 == len(data)


def test_overlap_matches_serial_duration(tmp_path):
    """Greedy generation through the overlap path produces the same codes
    and the same audio duration as the serial path (the waveform itself may
    differ sub-1e-3 at chunk boundaries by design — crossfaded prefix
    re-decodes with an anchored resize ratio)."""
    from miotts_tpu.serving.engine import ServingEngine
    from miotts_tpu.serving.state import ServerConfig, parse_request_json

    cfg_codec = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(tmp_path / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(tmp_path / "llm.gguf"),
                             n_audio=cfg_codec.vocab_size, seed=1)
    rng = np.random.RandomState(0)
    emb_path = tmp_path / "v.emb.gguf"
    save_embedding_gguf(emb_path,
                        rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))
    cfg = ServerConfig(
        model_vocoder=str(tmp_path / "codec.gguf"),
        model=str(tmp_path / "llm.gguf"), output_dir=str(tmp_path / "out"),
        n_parallel=2, n_predict=64, n_ctx=256,
        reference_file_json=json.dumps({"key": "p", "path": str(emb_path)}),
    )
    eng = ServingEngine(cfg)
    body = {"text": "same codes please", "reference_key": "p",
            "n_predict": 48, "temp": 0.0, "seed": 3}
    out_s: dict = {}
    audio_s, sr_s = eng.run_tts_request(parse_request_json(body, cfg), out_s)
    out_o: dict = {}
    audio_o, sr_o = eng.run_tts_request(
        parse_request_json({**body, "overlap_synthesis": True}, cfg), out_o)
    assert out_o["mode"] == "synthesis_overlap"
    assert out_s["codes"] == out_o["codes"] > 0
    assert sr_s == sr_o
    assert audio_s.size == audio_o.size
    assert np.isfinite(audio_o).all() and np.abs(audio_o).max() > 0


def test_oversized_prompt_falls_back_to_dedicated_generation(tmp_path):
    """A prompt beyond the continuous batcher's fixed KV budget must still
    generate (dedicated per-request context sized like the reference,
    tts-mio-cli.cpp:1018) instead of erroring."""
    from miotts_tpu.serving.engine import ServingEngine
    from miotts_tpu.serving.state import ServerConfig, parse_request_json

    cfg_codec = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(tmp_path / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(tmp_path / "llm.gguf"),
                             n_audio=cfg_codec.vocab_size, seed=1)
    rng = np.random.RandomState(0)
    emb_path = tmp_path / "v.emb.gguf"
    save_embedding_gguf(emb_path,
                        rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))
    cfg = ServerConfig(
        model_vocoder=str(tmp_path / "codec.gguf"),
        model=str(tmp_path / "llm.gguf"), output_dir=str(tmp_path / "out"),
        n_parallel=2, n_predict=24, n_ctx=96,
        reference_file_json=json.dumps({"key": "p", "path": str(emb_path)}),
    )
    eng = ServingEngine(cfg)
    # byte-level synthetic tokenizer: ~1 token/char; batcher budget is
    # n_ctx + n_predict + 64 - 8 = 176 tokens -> this prompt exceeds it
    long_text = "oversized prompt " * 20
    out: dict = {}
    rp = parse_request_json({"text": long_text, "reference_key": "p",
                             "n_predict": 16}, cfg)
    seen: list[int] = []
    codes = eng._generate_codes(rp, out, on_token=lambda t, i, e: (seen.append(t)
                                                                   or True))
    assert codes and out["n_tokens"] == len(seen) > 0
    assert out["llm_ms"] > 0


def test_streaming_request_audio_before_generation_done(tmp_path):
    """Engine-level ordering proof: on_audio fires before code acquisition
    finishes, i.e. PCM really leaves while the LLM is still generating.
    Uses its own engine with a generation budget long enough (3 decode
    chunks, ~30 codes at the synthetic model's code density) that the first
    stable audio chunk must land mid-generation regardless of the exact
    sampled sequence."""
    from miotts_tpu.serving.engine import ServingEngine
    from miotts_tpu.serving.state import ServerConfig, parse_request_json

    cfg_codec = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(tmp_path / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(tmp_path / "llm.gguf"),
                             n_audio=cfg_codec.vocab_size, seed=1)
    rng = np.random.RandomState(0)
    emb_path = tmp_path / "v.emb.gguf"
    save_embedding_gguf(emb_path,
                        rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))
    cfg = ServerConfig(
        model_vocoder=str(tmp_path / "codec.gguf"),
        model=str(tmp_path / "llm.gguf"), output_dir=str(tmp_path / "out"),
        n_parallel=2, n_predict=96, n_ctx=256,
        reference_file_json=json.dumps({"key": "p", "path": str(emb_path)}),
    )
    eng = ServingEngine(cfg)
    rp = parse_request_json(
        {"text": "interleave please", "reference_key": "p",
         "n_predict": 96}, cfg)
    seq = []
    audio, sr = eng.run_streaming_request(
        rp, {}, on_audio=lambda pcm: seq.append("audio"),
        on_codes=lambda codes: seq.append("codes_done"))
    assert "audio" in seq and "codes_done" in seq
    assert seq.index("audio") < seq.index("codes_done"), seq
    assert audio.size > 0 and sr == 24000


def test_sse_concurrent_streams_share_batcher(server):
    """Concurrent SSE requests run through the continuous batcher (shared
    chunk steps) — all succeed and produce audio (vs the reference's
    llm_gen_mutex serialization, tts-mio-server.cpp:3786-3807)."""
    import concurrent.futures

    srv, *_ = server

    def one(i):
        with _post_json(srv, "/mio/tts/stream",
                        {"text": f"concurrent {i}", "reference_key": "preset",
                         "stream_tokens": True, "n_predict": 16}) as r:
            events, _ = _parse_sse(r.read().decode())
        return events

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(4)))
    for events in results:
        assert "generation_complete" in events, events.keys()
        assert "audio_data" in events


def test_constructor_failure_joins_early_codec_warm(tmp_path):
    """A constructor failure AFTER the early codec warm thread starts
    (here: a missing preload reference file) must join the thread before
    propagating — unwinding with a daemon thread mid-PJRT-call crashes
    interpreter exit — and must shut the shared warm pool down."""
    from miotts_tpu.serving.engine import ServingEngine
    from miotts_tpu.serving.state import ServerConfig

    cfg_codec = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(tmp_path / "codec.gguf"), cfg_codec,
                                  seed=0)
    cfg = ServerConfig(
        model_vocoder=str(tmp_path / "codec.gguf"),
        model="", output_dir=str(tmp_path / "out"),
        n_parallel=2, n_predict=32, n_ctx=64, warmup=True,
        reference_file_json=json.dumps(
            {"key": "p", "path": str(tmp_path / "missing.emb.gguf")}),
    )
    import threading

    before = {t.name for t in threading.enumerate()}
    with pytest.raises(Exception):
        ServingEngine(cfg)
    leaked = [t for t in threading.enumerate()
              if t.name not in before and
              ("warmup" in t.name or "ThreadPoolExecutor" in t.name)
              and t.is_alive()]
    assert not leaked, leaked


def test_warmup_covers_default_buckets(tmp_path):
    """After --warmup, a default-settings request (codes at the n_predict
    bucket ceiling + a text request) triggers ZERO new compiles — the bucket
    ladder and prompt buckets are all warm (VERDICT r1: a cold bucket 768
    costs the first long request minutes through the TPU relay)."""
    import miotts_tpu.models.llm as llm_mod
    from miotts_tpu.serving.engine import ServingEngine
    from miotts_tpu.serving.state import ServerConfig, parse_request_json

    cfg_codec = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(tmp_path / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(tmp_path / "llm.gguf"),
                             n_audio=cfg_codec.vocab_size, seed=1)
    rng = np.random.RandomState(0)
    emb_path = tmp_path / "v.emb.gguf"
    save_embedding_gguf(emb_path,
                        rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))
    cfg = ServerConfig(
        model_vocoder=str(tmp_path / "codec.gguf"),
        model=str(tmp_path / "llm.gguf"), output_dir=str(tmp_path / "out"),
        n_parallel=2, n_predict=64, n_ctx=128, warmup=True,
        reference_file_json=json.dumps({"key": "p", "path": str(emb_path)}),
    )
    eng = ServingEngine(cfg)
    # llm_prefill_KV_jit is the executable the serving path actually
    # compiles (ContinuousBatcher.submit/warm_prefill) — monitoring the
    # legacy llm_prefill_jit would leave this guard blind to cold prefills
    sizes = lambda: (eng.pipeline._synth_fn._cache_size(),
                     llm_mod.llm_prefill_kv_jit._cache_size(),
                     llm_mod.llm_generate_chunk_batched._cache_size(),
                     # the width-sliced chunk family is what sub-full-
                     # occupancy requests actually dispatch — without it
                     # this guard is blind to a hole in the warmup's
                     # (ladder x width) grid
                     llm_mod.llm_generate_chunk_batched_sliced._cache_size())
    # the warmup tail (burst-prefill pow2 ladder) runs on a background
    # thread — wait for it or the snapshot races the warm calls
    if getattr(eng, "_warmup_bg_thread", None) is not None:
        eng._warmup_bg_thread.join(timeout=120)
    assert eng.warmup_bg_done
    warm = sizes()
    # every bucket <= the n_predict ceiling must be warm, including the
    # SMALLER ones (regression: concurrent warm calls once coalesced in the
    # micro-batcher into one group padded to the largest bucket, silently
    # skipping the rest)
    from miotts_tpu.pipeline import pick_bucket

    top = pick_bucket(cfg.n_predict, eng.pipeline.buckets)
    for bucket in [b for b in eng.pipeline.buckets if b <= top]:
        out: dict = {}
        rp = parse_request_json(
            {"codes": list(range(bucket - 4)), "reference_key": "p"}, cfg)
        eng.run_tts_request(rp, out)
        assert out["ok"]
        assert sizes() == warm, (
            f"bucket {bucket} was cold: {sizes()} != {warm}")
    # text request through prefill + chunked decode
    rp = parse_request_json({"text": "hello warm buckets", "reference_key": "p",
                             "n_predict": 32}, cfg)
    out = {}
    eng.run_tts_request(rp, out)
    assert out["ok"]
    # streaming request: the prefix re-decode variant (separate static args)
    # must be warm too
    rp = parse_request_json({"text": "warm streaming", "reference_key": "p",
                             "n_predict": 32, "stream_audio": True}, cfg)
    out = {}
    eng.run_streaming_request(rp, out)
    assert out["ok"]
    assert sizes() == warm, f"cold executables compiled: {sizes()} != {warm}"
    # a simultaneous burst coalesces into a multi-lane prefill group —
    # every pow2 group size up to n_parallel must already be warm
    # (regression: intermediate sizes compiled on first use, costing the
    # first conc=8 burst 4.7 s TTFA p50 vs 358 ms steady on chip)
    import concurrent.futures

    def one(i):
        o: dict = {}
        r = parse_request_json({"text": f"burst {i}", "reference_key": "p",
                                "n_predict": 16}, cfg)
        eng.run_tts_request(r, o)
        return o["ok"]

    with concurrent.futures.ThreadPoolExecutor(cfg.n_parallel) as ex:
        assert all(ex.map(one, range(cfg.n_parallel)))
    assert sizes() == warm, (
        f"burst compiled a cold prefill group: {sizes()} != {warm}")
