"""Sequence-parallel codec decode on the virtual 8-device CPU mesh.

The reference is single-process (SURVEY §2: no collectives anywhere); sp is
a TPU-native addition — one long utterance's decode shards its TIME axis
over an ("sp",) mesh (parallel/mesh.make_sp_mesh), with GSPMD deriving the
conv halo exchanges, masked-GroupNorm stat reductions and bilinear-resize
gathers from the sharding constraints in models/miocodec.codec_decode_spec.
These tests pin the contract: an sp decode must match the single-device
decode sample-for-sample (up to f32 collective reduction-order noise).
"""

import jax
import numpy as np
import pytest

from miotts_tpu.parallel.mesh import make_sp_mesh
from miotts_tpu.pipeline import MioTTSPipeline
from miotts_tpu.testing import tiny_codec_config, write_synthetic_miocodec_gguf

# peak-normalized audio is O(1); 1e-4 absorbs reduction-order drift while
# still catching any halo/boundary bug (those produce O(rms) errors)
ATOL = 1e-4


@pytest.fixture(scope="module")
def codec_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("sp")
    plain = d / "codec.gguf"
    write_synthetic_miocodec_gguf(str(plain), tiny_codec_config(), seed=0)
    ups = d / "codec_ups.gguf"
    write_synthetic_miocodec_gguf(
        str(ups),
        tiny_codec_config(wave_upsampler_factors=(2, 2),
                          wave_upsampler_kernel_sizes=(4, 4)),
        seed=0)
    return str(plain), str(ups)


def _codes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 128, size=n).astype(np.int32)


def _emb(seed=0):
    rng = np.random.default_rng(seed + 100)
    return (rng.standard_normal(16) * 0.1).astype(np.float32)


def test_sp_mesh_shape():
    mesh = make_sp_mesh(jax.devices(), sp=4)
    assert mesh.shape == {"sp": 4}
    assert mesh.axis_names == ("sp",)


def test_sp_mesh_oversized_raises():
    """Requesting more shards than devices must raise, not silently build a
    smaller mesh (callers do shard math against the requested sp)."""
    with pytest.raises(ValueError):
        make_sp_mesh(jax.devices(), sp=len(jax.devices()) + 1)


def test_sp_mel_mode_pins_xla_impl(tmp_path_factory, monkeypatch):
    """sp + mel-mode must never dispatch Pallas vocoder kernels: a
    pallas_call is opaque to the GSPMD partitioner (the same constraint
    that pins attention to 'blocked' under sp). MIOTTS_ACT1D=pallas forces
    the Pallas path everywhere else — the sp pin must override it."""
    from miotts_tpu.testing import write_synthetic_mel_vocoder_gguf

    d = tmp_path_factory.mktemp("sp_mel")
    path = d / "mel.gguf"
    cfg = tiny_codec_config(
        model_type=1, n_mels=12, n_fft=64, hop_length=16, samples_per_token=32,
        resnet_blocks=0,
        vocoder_upsample_rates=(4, 2, 2), vocoder_num_kernels=2)
    write_synthetic_mel_vocoder_gguf(str(path), cfg, seed=0)
    codes, emb = _codes(96, seed=5), _emb(seed=5)
    ref = MioTTSPipeline(str(path)).synthesize(codes, emb)

    import miotts_tpu.ops.pallas.activation1d as act1d_mod
    import miotts_tpu.ops.pallas.conv1d as conv1d_mod

    def _boom(*a, **k):  # pragma: no cover - the assertion target
        raise AssertionError("Pallas kernel dispatched under sp")

    monkeypatch.setenv("MIOTTS_ACT1D", "pallas")
    monkeypatch.setattr(act1d_mod, "fused_activation1d", _boom)
    monkeypatch.setattr(conv1d_mod, "conv1d_same_pallas", _boom)
    got = MioTTSPipeline(str(path), sp_devices=jax.devices()[:2]).synthesize(
        codes, emb)
    assert len(ref.audio) == len(got.audio)
    np.testing.assert_allclose(got.audio, ref.audio, atol=ATOL, rtol=0)


def test_sp_weights_single_upload_replicated(codec_paths):
    """Weights must land mesh-replicated straight from the packed upload
    (the old path uploaded to the default device, then re-transferred the
    whole tree to the mesh)."""
    plain, _ = codec_paths
    pipe = MioTTSPipeline(plain, sp_devices=jax.devices()[:4])
    leaves = jax.tree.leaves(pipe.weights)
    assert leaves
    for leaf in leaves:
        assert len(leaf.sharding.device_set) == 4
        assert leaf.sharding.is_fully_replicated


@pytest.mark.parametrize("sp", [2, 8])
def test_sp_decode_matches_single_device(codec_paths, sp):
    plain, _ = codec_paths
    codes, emb = _codes(300), _emb()
    ref = MioTTSPipeline(plain).synthesize(codes, emb)
    got = MioTTSPipeline(plain, sp_devices=jax.devices()[:sp]).synthesize(
        codes, emb)
    assert len(ref.audio) == len(got.audio)
    assert got.n_frames == ref.n_frames
    np.testing.assert_allclose(got.audio, ref.audio, atol=ATOL, rtol=0)


def test_sp_decode_matches_with_wave_upsampler(codec_paths):
    _, ups = codec_paths
    codes, emb = _codes(137, seed=1), _emb(seed=1)
    ref = MioTTSPipeline(ups).synthesize(codes, emb)
    got = MioTTSPipeline(ups, sp_devices=jax.devices()).synthesize(codes, emb)
    assert len(ref.audio) == len(got.audio)
    np.testing.assert_allclose(got.audio, ref.audio, atol=ATOL, rtol=0)


def test_sp_ragged_lengths_match(codec_paths):
    """Lengths that don't divide evenly across shards (padding invariance
    must survive the sp partitioning: the masked tail crosses a shard
    boundary)."""
    plain, _ = codec_paths
    pipe1 = MioTTSPipeline(plain)
    pipe8 = MioTTSPipeline(plain, sp_devices=jax.devices())
    for n in (33, 61, 100):
        codes, emb = _codes(n, seed=n), _emb(seed=n)
        ref = pipe1.synthesize(codes, emb)
        got = pipe8.synthesize(codes, emb)
        assert len(ref.audio) == len(got.audio), n
        np.testing.assert_allclose(got.audio, ref.audio, atol=ATOL, rtol=0,
                                   err_msg=f"n={n}")


def test_sp_window_fetch_matches(codec_paths):
    """The streaming window fetch path (pipeline._pack_audio_window) must
    read the same slice from an sp-sharded decode."""
    plain, _ = codec_paths
    codes, emb = _codes(80, seed=7), _emb(seed=7)
    pipe1 = MioTTSPipeline(plain)
    pipe8 = MioTTSPipeline(plain, sp_devices=jax.devices())
    ref = pipe1.synthesize(codes, emb, window=(256, 512), peak_normalize=False)
    got = pipe8.synthesize(codes, emb, window=(256, 512), peak_normalize=False)
    assert ref.n_total == got.n_total
    np.testing.assert_allclose(got.audio, ref.audio, atol=ATOL, rtol=0)


def test_sp_cli_flag(codec_paths, tmp_path):
    """--sequence-parallel through the real CLI surface (codes-in decode,
    CLI test T6 shape)."""
    from miotts_tpu.cli import main as cli_main
    from miotts_tpu.gguf.writer import save_embedding_gguf

    plain, _ = codec_paths
    codes = _codes(50, seed=3)
    codes_txt = tmp_path / "codes.txt"
    codes_txt.write_text("\n".join(str(c) for c in codes))
    emb_path = tmp_path / "ref.emb.gguf"
    save_embedding_gguf(str(emb_path), _emb(seed=3))
    out1 = tmp_path / "out1.wav"
    out8 = tmp_path / "out8.wav"
    rc = cli_main(["-mv", plain, "--tts-mio-codes-in", str(codes_txt),
                   "--tts-mio-embedding-in", str(emb_path), "-o", str(out1)])
    assert rc == 0
    rc = cli_main(["-mv", plain, "--tts-mio-codes-in", str(codes_txt),
                   "--tts-mio-embedding-in", str(emb_path), "-o", str(out8),
                   "--sequence-parallel", "8"])
    assert rc == 0
    from miotts_tpu.runtime.audio_io import load_audio

    a1, sr1 = load_audio(str(out1))
    a8, sr8 = load_audio(str(out8))
    assert sr1 == sr8
    assert a1.shape == a8.shape
    # int16 PCM: f32 noise is at most ~1 LSB after quantization
    assert np.max(np.abs(a1 - a8)) <= 2.0 / 32767.0
