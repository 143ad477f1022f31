"""Multi-device serving fan-out on the virtual 8-device CPU mesh:
--mio-backend-devices builds a dp mesh; batch lanes and codec micro-batches
shard across it (the TPU-native form of the reference's slot-over-backends
round-robin, tts-mio-server.cpp:2659-2746), and results match single-device.
"""

import json

import jax
import numpy as np
import pytest

from miotts_tpu.gguf.writer import save_embedding_gguf
from miotts_tpu.parallel.mesh import parse_backend_devices
from miotts_tpu.serving.engine import ServingEngine
from miotts_tpu.serving.state import ServerConfig, parse_request_json
from miotts_tpu.testing import (
    tiny_codec_config, write_synthetic_llm_gguf, write_synthetic_miocodec_gguf,
)


def _mk_cfg(d, emb_path, backend_devices, n_parallel=4, tensor_parallel=1):
    return ServerConfig(
        model_vocoder=str(d / "codec.gguf"), model=str(d / "llm.gguf"),
        output_dir=str(d / "out"),
        n_parallel=n_parallel, n_predict=32, n_ctx=128,
        mio_backend_devices=backend_devices,
        tensor_parallel=tensor_parallel,
        reference_file_json=json.dumps({"key": "preset", "path": str(emb_path)}),
    )


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("mdsrv")
    cfg_codec = tiny_codec_config()
    write_synthetic_miocodec_gguf(str(d / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(d / "llm.gguf"), n_audio=cfg_codec.vocab_size,
                             seed=1)
    rng = np.random.RandomState(0)
    emb_path = d / "voice.emb.gguf"
    save_embedding_gguf(emb_path,
                        rng.randn(cfg_codec.decoder_adanorm_dim).astype(np.float32))
    return d, emb_path, cfg_codec


def test_parse_backend_devices():
    devs = jax.devices()
    assert parse_backend_devices("") is None
    assert parse_backend_devices("all") == list(devs)
    # a bare integer is an INDEX (same meaning with or without commas)
    assert parse_backend_devices("4") == [devs[4]]
    assert parse_backend_devices("0,2") == [devs[0], devs[2]]
    name = f"{devs[1].platform}:{devs[1].id}"
    assert parse_backend_devices(name.upper()) == [devs[1]]
    with pytest.raises(ValueError):
        parse_backend_devices("99")
    with pytest.raises(ValueError):
        parse_backend_devices("bogus:device")


@pytest.fixture(scope="module")
def engines(assets):
    d, emb_path, _ = assets
    single = ServingEngine(_mk_cfg(d, emb_path, ""))
    meshed = ServingEngine(_mk_cfg(d, emb_path, "all", n_parallel=8))
    return single, meshed


def test_state_sharded_across_devices(engines):
    """Lanes really land on distinct devices: the batched KV cache and the
    lane axis shard over the full dp mesh."""
    _, meshed = engines
    assert meshed.mesh is not None and meshed.mesh.devices.size == 8
    cache = meshed.batcher.state.cache_k
    used = {s.device for s in cache.addressable_shards}
    assert used == set(jax.devices()), f"cache spans {len(used)} devices"
    # lane axis (axis 1 of [L, B, S, H, D]) is the sharded one
    spec = cache.sharding.spec
    assert spec[1] == "dp"
    # width-sliced chunk steps must stay OFF on a dp mesh: gathering a
    # lane slice out of the dp-sharded state would reshard across devices
    # every chunk
    assert meshed.batcher.slice_chunks is False


def test_generation_matches_single_device(engines):
    """Identical request (same seed) through the dp-meshed engine and the
    single-device engine yields identical codes — fan-out changes placement,
    not results."""
    single, meshed = engines
    body = {"text": "match me", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 7}
    out_s: dict = {}
    out_m: dict = {}
    codes_s = single._generate_codes(
        parse_request_json(body, single.cfg), out_s)
    codes_m = meshed._generate_codes(
        parse_request_json(body, meshed.cfg), out_m)
    assert codes_s == codes_m
    assert out_s["n_tokens"] == out_m["n_tokens"] > 0


def test_tensor_parallel_serving_matches_single_device(assets, engines):
    """--tensor-parallel 2 over the 8-device mesh (dp=4, tp=2): the LLM
    weights shard megatron-style, the serving flow still works end-to-end,
    and greedy codes are identical to the single-device engine."""
    d, emb_path, _ = assets
    single, _ = engines
    tp_eng = ServingEngine(_mk_cfg(d, emb_path, "all", n_parallel=4,
                                   tensor_parallel=2))
    assert tp_eng.mesh is not None
    assert tp_eng.mesh.shape["tp"] == 2 and tp_eng.mesh.shape["dp"] == 4
    # column-parallel leaves really shard over tp
    wq = tp_eng.llm.weights.get("wqkv")
    if wq is None:
        wq = tp_eng.llm.weights["wq"]
    assert "tp" in jax.tree.leaves(
        [wq])[0].sharding.spec, "LLM weights are not tp-sharded"

    body = {"text": "match me tp", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 5}
    out_s: dict = {}
    out_t: dict = {}
    codes_s = single._generate_codes(
        parse_request_json(body, single.cfg), out_s)
    codes_t = tp_eng._generate_codes(
        parse_request_json(body, tp_eng.cfg), out_t)
    assert codes_s == codes_t
    # full request flow (codec micro-batch on the same mesh) stays green
    rp = parse_request_json({"text": "tp synth", "reference_key": "preset",
                             "n_predict": 12}, tp_eng.cfg)
    out: dict = {}
    audio, sr = tp_eng.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0


def test_quantized_tensor_parallel_serving(assets, engines):
    """--llm-quant int8 + --tensor-parallel 2: the quantized (int8 payload +
    per-channel scale) leaves shard megatron-style over tp, the vocab axis
    of the logits head shards when divisible, and greedy codes through the
    W8A8 engine match the quantized single-device engine (quantization
    changes numerics vs bf16, so the oracle is the same-quant engine)."""
    d, emb_path, cfg_codec = assets
    # code-dense LLM: int8 rounding on random tiny weights otherwise leaves
    # greedy sampling without any audio-code tokens in a short generation
    dense_llm = d / "llm_dense.gguf"
    if not dense_llm.exists():
        write_synthetic_llm_gguf(str(dense_llm), n_audio=cfg_codec.vocab_size,
                                 seed=1, audio_logit_scale=3.0)
    q_cfg = _mk_cfg(d, emb_path, "", n_parallel=2)
    q_cfg.model = str(dense_llm)
    q_cfg.llm_quant = "int8"
    q_single = ServingEngine(q_cfg)
    assert q_single.llm.quantize == "int8"
    qtp_cfg = _mk_cfg(d, emb_path, "all", n_parallel=4, tensor_parallel=2)
    qtp_cfg.model = str(dense_llm)
    qtp_cfg.llm_quant = "int8"
    qtp = ServingEngine(qtp_cfg)
    # quantized leaves really shard: int8 payload + scales carry tp specs
    wq = qtp.llm.weights.get("wqkv") or qtp.llm.weights["wq"]
    assert isinstance(wq, dict), "int8 mode should produce quant leaves"
    assert any("tp" in leaf.sharding.spec for leaf in jax.tree.leaves(wq)), \
        "quantized LLM leaves are not tp-sharded"

    body = {"text": "quantized tp", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 3}
    out_s: dict = {}
    out_t: dict = {}
    codes_s = q_single._generate_codes(
        parse_request_json(body, q_single.cfg), out_s)
    codes_t = qtp._generate_codes(parse_request_json(body, qtp.cfg), out_t)
    assert codes_s == codes_t
    rp = parse_request_json({"text": "quant synth", "reference_key": "preset",
                             "n_predict": 12}, qtp.cfg)
    out: dict = {}
    audio, sr = qtp.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0


def test_tensor_parallel_streaming_request(assets):
    """Streaming synthesis through a tp-sharded engine: the continuous
    batcher's tp-sharded chunk steps and the dp-sharded codec micro-batcher
    compose — audio chunks arrive before code acquisition completes."""
    d, emb_path, cfg_codec = assets
    # code-dense LLM (audio_logit_scale): the streaming first-feed must
    # trigger mid-generation for the ordering assertion to be meaningful
    dense_llm = d / "llm_dense.gguf"
    if not dense_llm.exists():
        write_synthetic_llm_gguf(str(dense_llm), n_audio=cfg_codec.vocab_size,
                                 seed=1, audio_logit_scale=3.0)
    cfg = _mk_cfg(d, emb_path, "all", n_parallel=4, tensor_parallel=2)
    cfg.model = str(dense_llm)
    eng = ServingEngine(cfg)
    rp = parse_request_json({"text": "stream over tp", "reference_key": "preset",
                             "n_predict": 96, "stream_audio": True},
                            eng.cfg)
    seq: list[str] = []
    out: dict = {}
    audio, sr = eng.run_streaming_request(
        rp, out, on_audio=lambda pcm: seq.append("audio"),
        on_codes=lambda codes: seq.append("codes_done"))
    assert out["ok"] and audio.size > 0
    assert "audio" in seq and "codes_done" in seq
    assert seq.index("audio") < seq.index("codes_done"), seq


def test_codec_devices_disjoint_placement(assets):
    """--codec-devices carves codec synthesis onto its own device set,
    disjoint from the LLM mesh: micro-batches land only on those devices,
    serial and overlap requests both work, and greedy codes stay identical
    to a plain engine (placement must not change math)."""
    d, emb_path, _ = assets
    cfg = _mk_cfg(d, emb_path, "0,1,2,3", n_parallel=4)
    cfg.codec_devices = "4,5"
    eng = ServingEngine(cfg)
    assert eng.mesh is not None and eng.mesh.devices.size == 4
    assert eng.codec_mesh is not eng.mesh
    codec_devs = {dev for dev in eng.codec_mesh.devices.reshape(-1)}
    assert codec_devs == {jax.devices()[4], jax.devices()[5]}
    # codec weights replicated onto the codec mesh only
    leaf = jax.tree.leaves(eng.pipeline.weights)[0]
    assert {s.device for s in leaf.addressable_shards} <= codec_devs

    plain = ServingEngine(_mk_cfg(d, emb_path, ""))
    body = {"text": "disjoint codec", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 9}
    out_a: dict = {}
    out_b: dict = {}
    codes_a = eng._generate_codes(parse_request_json(body, eng.cfg), out_a)
    codes_b = plain._generate_codes(parse_request_json(body, plain.cfg),
                                    out_b)
    assert codes_a == codes_b
    # full request (codec on its own mesh) and overlap synthesis both green
    rp = parse_request_json({"text": "serial", "reference_key": "preset",
                             "n_predict": 16}, eng.cfg)
    out: dict = {}
    audio, sr = eng.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0
    rp = parse_request_json({"text": "overlapped", "reference_key": "preset",
                             "n_predict": 48, "overlap_synthesis": True},
                            eng.cfg)
    out = {}
    audio, sr = eng.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0


def test_reference_generation_under_mesh(assets, tmp_path):
    """Voice cloning on a dp/tp engine: WavLM + the mesh-replicated global
    encoder produce the same embedding as a single-device engine, and the
    cloned reference synthesizes."""
    from miotts_tpu.runtime.audio_io import save_wav16
    from miotts_tpu.testing import write_synthetic_wavlm_gguf

    # self-contained assets: codec whose global encoder accepts the tiny
    # wavlm's 32-dim SSL features
    d = tmp_path
    cfg_codec = tiny_codec_config(global_encoder_input_channels=32)
    write_synthetic_miocodec_gguf(str(d / "codec.gguf"), cfg_codec, seed=0)
    write_synthetic_llm_gguf(str(d / "llm.gguf"), n_audio=cfg_codec.vocab_size,
                             seed=1)
    wavlm = d / "wavlm.gguf"
    write_synthetic_wavlm_gguf(str(wavlm), seed=2)
    emb_path = d / "voice.emb.gguf"
    save_embedding_gguf(emb_path, np.random.RandomState(0).randn(
        cfg_codec.decoder_adanorm_dim).astype(np.float32))
    sr = 24000
    wav = tmp_path / "ref.wav"
    t = np.arange(sr // 2) / sr
    save_wav16(wav, (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)

    cfg_s = _mk_cfg(d, emb_path, "")
    cfg_s.wavlm_model = str(wavlm)
    single = ServingEngine(cfg_s)
    cfg_m = _mk_cfg(d, emb_path, "all", tensor_parallel=2)
    cfg_m.wavlm_model = str(wavlm)
    mesh_eng = ServingEngine(cfg_m)
    e1 = single.generate_reference(str(wav), "clone", 20.0)
    e2 = mesh_eng.generate_reference(str(wav), "clone", 20.0)
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-5)
    out: dict = {}
    rp = parse_request_json({"codes": [1, 2, 3, 4], "reference_key": "clone"},
                            cfg_m)
    audio, _ = mesh_eng.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0


def test_warmup_under_mesh(assets):
    """--warmup on a dp/tp engine: CodecMicroBatcher.warm device_puts its
    dummy batch with the mesh shardings and ContinuousBatcher.warm_prefill
    runs against tp-sharded weights — then a real request triggers no new
    codec compiles."""
    d, emb_path, _ = assets
    cfg = _mk_cfg(d, emb_path, "all", n_parallel=4, tensor_parallel=2)
    cfg.warmup = True
    eng = ServingEngine(cfg)
    warm = eng.pipeline._synth_fn._cache_size()
    out: dict = {}
    rp = parse_request_json({"codes": list(range(24)), "reference_key": "preset"},
                            cfg)
    audio, sr = eng.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0
    assert eng.pipeline._synth_fn._cache_size() == warm
    out = {}
    rp = parse_request_json({"text": "warm mesh", "reference_key": "preset",
                             "n_predict": 16}, cfg)
    eng.run_tts_request(rp, out)
    assert out["ok"]


def test_tensor_parallel_requires_devices(assets):
    d, emb_path, _ = assets
    with pytest.raises(ValueError, match="tensor-parallel"):
        ServingEngine(_mk_cfg(d, emb_path, "", tensor_parallel=2))
    with pytest.raises(ValueError, match="does not divide"):
        ServingEngine(_mk_cfg(d, emb_path, "0,1,2", tensor_parallel=2))


def test_codec_batch_sharded_and_matches(engines):
    """Codec micro-batch shards over dp and reproduces the single-device
    waveform."""
    single, meshed = engines
    rng = np.random.RandomState(3)
    codes = rng.randint(0, single.pipeline.config.vocab_size, 40).tolist()
    emb = meshed.ref_cache.get("preset")
    r_s = single.codec_batcher.synthesize(codes, emb)
    r_m = meshed.codec_batcher.synthesize(codes, emb)
    assert r_s.audio.size == r_m.audio.size > 0
    np.testing.assert_allclose(r_m.audio, r_s.audio, rtol=1e-4, atol=1e-5)


def test_full_request_flow_on_mesh(engines):
    """run_tts_request end-to-end on the meshed engine, and state stays
    dp-sharded after chunks ran (no silent fallback to replication)."""
    _, meshed = engines
    rp = parse_request_json({"text": "hello mesh", "reference_key": "preset",
                             "n_predict": 16}, meshed.cfg)
    out: dict = {}
    res = meshed.run_tts_request(rp, out)
    assert res is not None
    audio, sr = res
    assert out["ok"] and audio.size > 0 and sr == 24000
    cache = meshed.batcher.state.cache_k
    used = {s.device for s in cache.addressable_shards}
    assert len(used) == 8, "post-chunk state lost its dp sharding"


def test_concurrent_requests_spread_over_mesh(engines):
    """Concurrent requests attach to different lanes (different shards)."""
    import concurrent.futures

    _, meshed = engines

    def one(i):
        rp = parse_request_json(
            {"text": f"lane {i}", "reference_key": "preset", "n_predict": 12},
            meshed.cfg)
        out: dict = {}
        audio, _sr = meshed.run_tts_request(rp, out)
        return out["codes"], audio.size

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(6)))
    assert all(n_codes > 0 and n_audio > 0 for n_codes, n_audio in results)


def test_output_int8_tensor_parallel_serving(assets, engines):
    """--llm-quant output_int8 on a tp mesh: ONLY the logits head is a
    quant leaf (layers dense, so they tp-shard as plain arrays), the head's
    int8 payload shards over tp when the vocab divides, and greedy codes
    match the same-quant single-device engine."""
    d, emb_path, cfg_codec = assets
    dense_llm = d / "llm_dense.gguf"
    if not dense_llm.exists():
        write_synthetic_llm_gguf(str(dense_llm), n_audio=cfg_codec.vocab_size,
                                 seed=1, audio_logit_scale=3.0)
    oi_cfg = _mk_cfg(d, emb_path, "", n_parallel=2)
    oi_cfg.model = str(dense_llm)
    oi_cfg.llm_quant = "output_int8"
    oi_single = ServingEngine(oi_cfg)
    oitp_cfg = _mk_cfg(d, emb_path, "all", n_parallel=4, tensor_parallel=2)
    oitp_cfg.model = str(dense_llm)
    oitp_cfg.llm_quant = "output_int8"
    oitp = ServingEngine(oitp_cfg)
    w = oitp.llm.weights
    assert isinstance(w["output"], dict) and "q8" in w["output"]
    wq = w["wqkv"] if "wqkv" in w else w["wq"]
    assert not isinstance(wq, dict), "layers must stay dense"
    assert "tp" in jax.tree.leaves([wq])[0].sharding.spec

    body = {"text": "head quant tp", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 3}
    out_s: dict = {}
    out_t: dict = {}
    codes_s = oi_single._generate_codes(
        parse_request_json(body, oi_single.cfg), out_s)
    codes_t = oitp._generate_codes(parse_request_json(body, oitp.cfg), out_t)
    assert codes_s == codes_t
    rp = parse_request_json({"text": "oi8 synth", "reference_key": "preset",
                             "n_predict": 12}, oitp.cfg)
    out: dict = {}
    audio, sr = oitp.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0


def test_output_int4_tensor_parallel_serving(assets, engines):
    """--llm-quant output_int4 on a tp mesh: the head's int8-storage leaf
    ("q4i8") shards over the vocab axis, the in-graph int4 conversion
    (_prepare_decode_weights) partitions shard-locally, and greedy codes
    match the same-quant single-device engine (integer math is exact)."""
    d, emb_path, cfg_codec = assets
    dense_llm = d / "llm_dense.gguf"
    if not dense_llm.exists():
        write_synthetic_llm_gguf(str(dense_llm), n_audio=cfg_codec.vocab_size,
                                 seed=1, audio_logit_scale=3.0)
    s_cfg = _mk_cfg(d, emb_path, "", n_parallel=2)
    s_cfg.model = str(dense_llm)
    s_cfg.llm_quant = "output_int4"
    single = ServingEngine(s_cfg)
    tp_cfg = _mk_cfg(d, emb_path, "all", n_parallel=4, tensor_parallel=2)
    tp_cfg.model = str(dense_llm)
    tp_cfg.llm_quant = "output_int4"
    tp = ServingEngine(tp_cfg)
    w = tp.llm.weights
    assert isinstance(w["output"], dict) and "q4i8" in w["output"]
    assert "tp" in w["output"]["q4i8"].sharding.spec

    body = {"text": "int4 head tp", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 3}
    out_s: dict = {}
    out_t: dict = {}
    codes_s = single._generate_codes(
        parse_request_json(body, single.cfg), out_s)
    codes_t = tp._generate_codes(parse_request_json(body, tp.cfg), out_t)
    assert codes_s == codes_t
    rp = parse_request_json({"text": "i4 synth", "reference_key": "preset",
                             "n_predict": 12}, tp.cfg)
    out: dict = {}
    audio, sr = tp.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0


def test_int8_output_int4_tensor_parallel_serving(assets, engines):
    """--llm-quant int8_output_int4 on a tp mesh: every layer matmul is a
    W8A8 {"q8","s8"} leaf (int8 payload column-shards, per-N scales
    follow) AND the head is the W4A8 {"q4i8","s4"} leaf sharded over the
    vocab axis — the combined mode composes the two tested shardings.
    Greedy codes match the same-quant single-device engine."""
    d, emb_path, cfg_codec = assets
    dense_llm = d / "llm_dense.gguf"
    if not dense_llm.exists():
        write_synthetic_llm_gguf(str(dense_llm), n_audio=cfg_codec.vocab_size,
                                 seed=1, audio_logit_scale=3.0)
    s_cfg = _mk_cfg(d, emb_path, "", n_parallel=2)
    s_cfg.model = str(dense_llm)
    s_cfg.llm_quant = "int8_output_int4"
    single = ServingEngine(s_cfg)
    tp_cfg = _mk_cfg(d, emb_path, "all", n_parallel=4, tensor_parallel=2)
    tp_cfg.model = str(dense_llm)
    tp_cfg.llm_quant = "int8_output_int4"
    tp = ServingEngine(tp_cfg)
    w = tp.llm.weights
    assert isinstance(w["output"], dict) and "q4i8" in w["output"]
    assert "tp" in w["output"]["q4i8"].sharding.spec
    wq = w["wqkv"] if "wqkv" in w else w["wq"]
    assert isinstance(wq, dict) and "q8" in wq, "layers must be W8A8"
    assert "tp" in wq["q8"].sharding.spec

    body = {"text": "combo quant tp", "reference_key": "preset",
            "n_predict": 24, "temp": 0.0, "seed": 3}
    out_s: dict = {}
    out_t: dict = {}
    codes_s = single._generate_codes(
        parse_request_json(body, single.cfg), out_s)
    codes_t = tp._generate_codes(parse_request_json(body, tp.cfg), out_t)
    assert codes_s == codes_t
    rp = parse_request_json({"text": "combo synth", "reference_key": "preset",
                             "n_predict": 12}, tp.cfg)
    out: dict = {}
    audio, sr = tp.run_tts_request(rp, out)
    assert out["ok"] and audio.size > 0
