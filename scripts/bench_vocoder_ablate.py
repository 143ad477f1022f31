#!/usr/bin/env python3
"""Model-level ablation of the mel-vocoder forward: stub one op family at
a time inside the REAL vocoder_decode jit and measure the full-forward
delta on chip. Unlike bench_vocoder_stages.py (isolated per-op timing),
this captures each family's cost in context — XLA fusion, layout, and
scheduling included — so the sum of deltas accounts for the real total.

Usage: python scripts/bench_vocoder_ablate.py [reps=5]
"""
import functools
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from miotts_tpu.models import vocoder as V  # noqa: E402
from miotts_tpu.models.miocodec import load_miocodec  # noqa: E402
from miotts_tpu.testing import (full_codec_config,  # noqa: E402
                                write_synthetic_mel_vocoder_gguf)

CH = int(os.environ.get("MIOTTS_BENCH_VOCODER_CH", "128"))
LANES = 4
T0 = 256


def build():
    tmp = os.environ.get("TMPDIR", "/tmp")
    cfg = full_codec_config(
        model_type=1, n_mels=100, resnet_blocks=0,
        wave_upsampler_factors=(), wave_upsampler_kernel_sizes=(),
        vocoder_upsample_rates=(5, 4, 4, 3, 2), vocoder_num_kernels=3)
    path = os.path.join(tmp, f"miotts_bench_melvoc_{CH}.gguf")
    if not os.path.exists(path):
        write_synthetic_mel_vocoder_gguf(path, cfg, seed=0, ch=CH)
    mcfg, mw = load_miocodec(path)
    mw = jax.tree.map(jnp.asarray, mw)
    return mcfg, mw


def timeit(fn, x, lengths, reps):
    np.asarray(fn(x, lengths)[0][:, :8])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(x, lengths)[0][:, :8])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    mcfg, mw = build()
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(LANES, T0, 100).astype(np.float32) * 0.3)
    lengths = jnp.asarray([T0] * LANES, jnp.int32)
    print(f"devices={jax.devices()} mel=[{LANES},{T0},100] ch={CH}")

    real_act = V.activation1d
    real_lowpass = V.lowpass
    real_highpass = V.highpass
    real_conv_same = V.conv1d_same

    def run(name, patch: dict):
        for k, v in patch.items():
            setattr(V, k, v)
        try:
            with jax.default_matmul_precision("float32"):
                fn = jax.jit(functools.partial(V.vocoder_decode, mcfg, mw))
                t = timeit(fn, mel, lengths, reps)
        finally:
            for k in patch:
                setattr(V, k, {"activation1d": real_act,
                               "lowpass": real_lowpass,
                               "highpass": real_highpass,
                               "conv1d_same": real_conv_same}[k])
        print(f"{name:28s} {t * 1e3:8.1f} ms", flush=True)
        return t

    full = run("full", {})
    run("no-act1d (identity)", {
        "activation1d": lambda x, lengths, act, impl=None: (x, lengths)})
    run("no-lowpass (identity)", {
        "lowpass": lambda x, lengths, cutoff, stride=1: (
            (x[:, ::stride], (lengths + stride - 1) // stride)
            if stride > 1 else (x, lengths))})
    run("no-highpass (identity)", {
        "highpass": lambda x, lengths, cutoff: x})
    run("no-resblock-convs", {
        "conv1d_same": lambda x, lengths, w, b, dilation=1, residual=None,
        impl=None: x if residual is None else x + residual})
    print(f"full = {full * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
