"""Embeddable engine (mobile-shared-engine equivalent) tests."""

import numpy as np
import pytest

from miotts_tpu.embed import MioTTSEngine, _key_from_path
from miotts_tpu.gguf.writer import save_embedding_gguf
from miotts_tpu.runtime.audio_io import save_wav16
from miotts_tpu.testing import (
    tiny_codec_config, write_synthetic_llm_gguf, write_synthetic_miocodec_gguf,
    write_synthetic_wavlm_gguf,
)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("embed")
    cfg = tiny_codec_config(global_encoder_input_channels=32)
    write_synthetic_miocodec_gguf(str(d / "codec.gguf"), cfg, seed=0)
    write_synthetic_llm_gguf(str(d / "llm.gguf"), n_audio=cfg.vocab_size, seed=1)
    write_synthetic_wavlm_gguf(str(d / "wavlm.gguf"), seed=2)
    rng = np.random.RandomState(0)
    for name in ("voice_a", "voice_b"):
        save_embedding_gguf(d / f"{name}.emb.gguf",
                            rng.randn(cfg.decoder_adanorm_dim).astype(np.float32))
    sr = 24000
    save_wav16(d / "ref.wav",
               (0.4 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32), sr)
    return d, cfg


def test_key_from_path():
    assert _key_from_path("/a/b/jp_female.emb.gguf") == "jp_female"
    assert _key_from_path("voice.gguf") == "voice"
    assert _key_from_path("clip.wav") == "clip"


def test_register_and_synthesize_codes(assets):
    d, cfg = assets
    eng = MioTTSEngine(str(d / "codec.gguf"))
    keys = eng.register_default_references(str(d))
    assert keys == ["voice_a", "voice_b"]
    assert eng.default_reference_key == "voice_a"
    wav = eng.synthesize_codes_to_wav(list(range(12)))  # default reference
    assert wav[:4] == b"RIFF"
    wav_b = eng.synthesize_codes_to_wav(list(range(12)), reference_key="voice_b")
    assert wav_b[:4] == b"RIFF" and wav_b != wav
    with pytest.raises(KeyError):
        eng.synthesize_codes_to_wav([1, 2], reference_key="missing")


def test_text_to_wav_with_lazy_llm_and_unload(assets):
    d, cfg = assets
    eng = MioTTSEngine(str(d / "codec.gguf"), llm_model=str(d / "llm.gguf"),
                       n_predict=12, llm_unload_after_generation=True)
    eng.register_reference("v", str(d / "voice_a.emb.gguf"))
    assert eng._llm is None
    wav = eng.synthesize_text_to_wav("hello", reference_key="v")
    assert wav[:4] == b"RIFF"
    assert eng._llm is None  # unloaded after generation


def test_voice_clone_roundtrip(assets):
    d, cfg = assets
    eng = MioTTSEngine(str(d / "codec.gguf"), wavlm_model=str(d / "wavlm.gguf"))
    emb = eng.create_reference_from_audio("cloned", str(d / "ref.wav"))
    assert emb.shape == (cfg.decoder_adanorm_dim,)
    wav = eng.synthesize_codes_to_wav([3, 4, 5, 6], reference_key="cloned")
    assert wav[:4] == b"RIFF"
    assert eng.remove_reference("cloned")
    assert not eng.remove_reference("cloned")


def test_engine_picks_native_cpu_for_quant_gguf(tmp_path):
    """On a CPU backend a Q4_0 LLM GGUF routes through the native
    block-quant engine (the mobile/local analog of CLI --cpu-native auto)."""
    import pytest

    from miotts_tpu.runtime.native import q4_available

    if not q4_available():
        pytest.skip("native q4 runtime unavailable")
    from miotts_tpu.embed import MioTTSEngine
    from miotts_tpu.models.llm_cpu import NativeCpuLLMEngine
    from miotts_tpu.testing import (
        tiny_codec_config, write_synthetic_llm_gguf,
        write_synthetic_miocodec_gguf,
    )

    cfg = tiny_codec_config()
    codec = tmp_path / "codec.gguf"
    llm = tmp_path / "llm_q4.gguf"
    write_synthetic_miocodec_gguf(str(codec), cfg, seed=0)
    write_synthetic_llm_gguf(str(llm), n_audio=cfg.vocab_size, seed=1,
                             quant="q4_0")
    eng = MioTTSEngine(str(codec), llm_model=str(llm))
    assert isinstance(eng._ensure_llm(), NativeCpuLLMEngine)
