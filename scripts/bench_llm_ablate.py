#!/usr/bin/env python3
"""Ablate the LLM decode-step cost on the real chip.

The 0.1B decode step runs at ~1.03 ms/step (8 lanes) against a ~0.46 ms
weight-HBM roofline; this script isolates where the other half goes by
timing llm_generate under sampler/precision ablations:

  base        exact top_k=50, temp=0.8 (headline bench config)
  approx      jax.lax.approx_max_k top-k (recall 0.95)
  greedy      temp=0, top_k=0 (argmax over raw logits — no top-k sort)
  penalty     base + repeat_penalty=1.1 (adds ring scatter + full-V passes)
  notopp      top_k=50, top_p=0.9 (adds cumsum path)

Usage: python scripts/bench_llm_ablate.py [variant ...]   (default: all)
Env: MIOTTS_BENCH_LANES (8), MIOTTS_BENCH_TOKENS (250), MIOTTS_BENCH_ITERS (3)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from miotts_tpu.models.llm import (
        SamplerParams, init_kv_cache, llm_generate, load_llm_gguf,
    )
    from miotts_tpu.runtime.compile_cache import enable_compile_cache
    from miotts_tpu.testing import write_synthetic_llm_gguf

    enable_compile_cache()
    lanes = int(os.environ.get("MIOTTS_BENCH_LANES", "8"))
    n_gen = int(os.environ.get("MIOTTS_BENCH_TOKENS", "250"))
    iters = int(os.environ.get("MIOTTS_BENCH_ITERS", "3"))

    llm_path = os.path.join(tempfile.gettempdir(), "miotts_bench_llm.gguf")
    if not os.path.exists(llm_path):
        write_synthetic_llm_gguf(llm_path, n_audio=12800, dim=768, n_layers=12,
                                 n_heads=12, n_kv_heads=2, ffn=2048, seed=0,
                                 n_filler_vocab=138_700)
    cfg, w, tok = load_llm_gguf(llm_path)
    print(f"devices={jax.devices()} lanes={lanes} tokens={n_gen}", file=sys.stderr)

    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, 256, (lanes, 32)).astype(np.int32))
    plen = jnp.asarray([24] * lanes, jnp.int32)
    eog = jnp.asarray([-1], jnp.int32)  # never stop: fixed step count
    S = 32 + n_gen + 32

    variants = {
        "base": SamplerParams(temp=0.8, top_k=50, top_p=1.0,
                              repeat_penalty=1.0, approx_top_k=False),
        "approx": SamplerParams(temp=0.8, top_k=50, top_p=1.0,
                                repeat_penalty=1.0, approx_top_k=True),
        "greedy": SamplerParams(temp=0.0, top_k=0, top_p=1.0,
                                repeat_penalty=1.0, approx_top_k=False),
        "penalty": SamplerParams(temp=0.8, top_k=50, top_p=1.0,
                                 repeat_penalty=1.1, approx_top_k=False),
        "topp": SamplerParams(temp=0.8, top_k=50, top_p=0.9,
                              repeat_penalty=1.0, approx_top_k=False),
    }
    names = sys.argv[1:] or list(variants)

    def run(sampler):
        ck, cv = init_kv_cache(cfg, lanes, S)
        out, ngen = llm_generate(cfg, w, prompt, plen, eog,
                                 jax.random.PRNGKey(0), n_gen, sampler, ck, cv)
        return np.asarray(out)  # real fetch = reliable barrier via the relay

    for name in names:
        sampler = variants[name]
        t0 = time.perf_counter()
        run(sampler)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run(sampler)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{name:8s} {dt * 1e3:7.1f} ms  {dt / n_gen * 1e3:6.3f} ms/step  "
              f"{lanes * n_gen / dt:6.0f} tok/s  (first {compile_s:.1f}s)",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
