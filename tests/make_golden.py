"""Regenerate the golden synthesis artifact (tests/golden/codec_golden.npz).

Run after an INTENTIONAL numerics change:  python tests/make_golden.py
The golden test (test_golden.py) guards against silent numerical
regressions in the codec decode graph across refactors.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthesize_golden():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from miotts_tpu.models.miocodec import codec_synthesize, load_miocodec
    from miotts_tpu.testing import tiny_codec_config, write_synthetic_miocodec_gguf

    path = "/tmp/golden_codec.gguf"
    write_synthetic_miocodec_gguf(path, tiny_codec_config(), seed=1234)
    cfg, w = load_miocodec(path)
    w = jax.tree.map(jnp.asarray, w)
    rng = np.random.RandomState(1234)
    n = 24
    tokens = np.zeros((1, 32), np.int32)
    tokens[0, :n] = rng.randint(0, cfg.vocab_size, n)
    cond = rng.randn(1, cfg.decoder_adanorm_dim).astype(np.float32)
    audio, n_samples = jax.jit(codec_synthesize, static_argnums=0)(
        cfg, w, jnp.asarray(tokens), jnp.asarray([n], jnp.int32),
        jnp.asarray(cond))
    return np.asarray(audio[0][: int(n_samples[0])])


if __name__ == "__main__":
    audio = synthesize_golden()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "golden", "codec_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, audio=audio)
    print(f"wrote {out}: {audio.shape} rms={np.sqrt((audio**2).mean()):.6f}")
