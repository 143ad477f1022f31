"""Split the mel-mode synthesis into trunk (codes->mel) vs vocoder
(mel->waveform) on chip, at the bench's production shapes. Also times the
full composite for cross-checking against MIOTTS_BENCH_MODE=vocoder.

Usage: python scripts/bench_vocoder_split.py [lanes=2] [tokens=250]
"""

import functools
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from miotts_tpu.models.miocodec import (  # noqa: E402
    codec_decode_spec, codec_synthesize, load_miocodec,
)
from miotts_tpu.models.vocoder import vocoder_decode  # noqa: E402
from miotts_tpu.testing import (  # noqa: E402
    full_codec_config, write_synthetic_mel_vocoder_gguf,
)


def fetch_time(fn, args, label, iters=4):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{label:45s} {dt * 1e3:8.1f} ms")
    return dt


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_gen = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    ch = int(os.environ.get("MIOTTS_BENCH_VOCODER_CH", "128"))
    cfg = full_codec_config(
        model_type=1, n_mels=100, resnet_blocks=0,
        wave_upsampler_factors=(), wave_upsampler_kernel_sizes=(),
        vocoder_upsample_rates=(5, 4, 4, 3, 2), vocoder_num_kernels=3)
    path = os.path.join(tempfile.gettempdir(), f"miotts_bench_melvoc_{ch}.gguf")
    if not os.path.exists(path):
        write_synthetic_mel_vocoder_gguf(path, cfg, seed=0, ch=ch)
    mcfg, w = load_miocodec(path)
    w = jax.tree.map(jnp.asarray, w)
    rng = np.random.RandomState(0)
    bucket = max(64, ((n_gen + 63) // 64) * 64)
    codes = jnp.asarray(
        rng.randint(0, mcfg.vocab_size, (lanes, bucket)).astype(np.int32))
    lens = jnp.asarray([n_gen] * lanes, jnp.int32)
    cond = jnp.asarray(rng.randn(lanes, mcfg.decoder_adanorm_dim)
                       .astype(np.float32))

    print(f"devices={jax.devices()} lanes={lanes} tokens={n_gen} ch={ch} "
          f"act1d={os.environ.get('MIOTTS_ACT1D', 'auto')}")
    trunk = jax.jit(functools.partial(codec_decode_spec, mcfg))
    d_trunk = fetch_time(trunk, (w, codes, lens, cond, None),
                         "trunk codes->mel (decode_spec)")
    mel, frame_len = trunk(w, codes, lens, cond, None)
    mel = jax.block_until_ready(mel)

    def voc(w, mel, fl):
        with jax.default_matmul_precision("float32"):
            return vocoder_decode(mcfg, w, mel, fl)

    d_voc = fetch_time(jax.jit(voc), (w, mel, frame_len),
                       "vocoder mel->waveform")
    full = jax.jit(functools.partial(codec_synthesize, mcfg))
    d_full = fetch_time(full, (w, codes, lens, cond),
                        "full codec_synthesize (f32 audio fetch)")
    audio_sec = lanes * n_gen * mcfg.samples_per_token / mcfg.sample_rate
    print(f"audio: {audio_sec:.1f}s -> trunk {audio_sec / d_trunk:.0f}x, "
          f"vocoder {audio_sec / d_voc:.0f}x, full {audio_sec / d_full:.0f}x")


if __name__ == "__main__":
    main()
