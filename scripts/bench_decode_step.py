#!/usr/bin/env python3
"""Decompose the 0.1B LLM decode-step cost on the real chip.

DESIGN.md records the step as latency-bound: ~170 serialized kernels hide
all ~380 MB/step of weight DMA, so ablating even the 233 MB logits matmul
moves the step <2%. This bench isolates the structural pieces by timing
fixed-token decode steps repeated INSIDE one jit (lax.fori_loop — the
per-call relay floor never touches the slope):

  base     llm_decode_step as shipped (28 per-layer cache scatters)
  defer    attention reads strict-past cache + explicit current-token
           score; per-layer K/V collect into [L,B,KVH,HD] and ONE batched
           scatter pair per STEP updates the cache (2 scatters vs 2L)
  defer0   defer without the final scatter at all (scatter-cost bound;
           math diverges after step 1 — timing-only)
  noattn   scores/softmax/att replaced by a passthrough (attention cost)
  nologits logits matmul replaced by a cheap broadcast (head cost)
  half     n_layers//2 (per-layer slope vs fixed overhead)

Per-step cost comes from the (N2 - N1) slope so loop setup/fetch cancels.

Usage: python scripts/bench_decode_step.py [variant ...]   (default: all)
Env: MIOTTS_BENCH_LANES (8), MIOTTS_BENCH_N1 (32), MIOTTS_BENCH_N2 (160),
     MIOTTS_BENCH_ITERS (3)
"""

from __future__ import annotations

import functools
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
        _layer_blk, _layer_ffn, _layer_qkv, _logits_matmul, _mm,
        _prepare_decode_weights, apply_rope_llm, init_kv_cache,
        llm_decode_step, load_llm_gguf, rms_norm,
    )
    from miotts_tpu.runtime.compile_cache import enable_compile_cache
    from miotts_tpu.testing import write_synthetic_llm_gguf

    enable_compile_cache()
    lanes = int(os.environ.get("MIOTTS_BENCH_LANES", "8"))
    n1 = int(os.environ.get("MIOTTS_BENCH_N1", "32"))
    n2 = int(os.environ.get("MIOTTS_BENCH_N2", "160"))
    iters = int(os.environ.get("MIOTTS_BENCH_ITERS", "3"))

    llm_path = os.path.join(tempfile.gettempdir(), "miotts_bench_llm.gguf")
    if not os.path.exists(llm_path):
        write_synthetic_llm_gguf(llm_path, n_audio=12800, dim=768, n_layers=12,
                                 n_heads=12, n_kv_heads=2, ffn=2048, seed=0,
                                 n_filler_vocab=138_700)
    cfg, w, tok = load_llm_gguf(llm_path)
    print(f"devices={jax.devices()} lanes={lanes} slope N {n1}->{n2}",
          file=sys.stderr)

    def make_step(mode: str, n_layers: int):
        def step(w, token, pos, cache_k, cache_v):
            B = token.shape[0]
            S = cache_k.shape[2]
            group = cfg.n_heads // cfg.n_kv_heads
            x = w["token_embd"][token][:, None, :]
            positions = pos[:, None]
            b_idx = jnp.arange(B)
            if mode in ("defer", "defer0"):
                kmask = (jnp.arange(S, dtype=jnp.int32)[None, :]
                         < pos[:, None])  # strict past
            else:
                kmask = (jnp.arange(S, dtype=jnp.int32)[None, :]
                         <= pos[:, None])
            new_ks, new_vs = [], []
            for li in range(n_layers):
                blk = _layer_blk(w, li)
                xn = rms_norm(x, blk["attn_norm"], cfg.rms_eps)
                q, k, v = _layer_qkv(cfg, blk, xn)
                q = apply_rope_llm(q, positions, cfg.rope_base, cfg.rope_neox)
                k = apply_rope_llm(k, positions, cfg.rope_base, cfg.rope_neox)
                if mode in ("defer", "defer0"):
                    new_ks.append(k[:, 0])
                    new_vs.append(v[:, 0])
                else:
                    cache_k = cache_k.at[li, b_idx, pos].set(
                        k[:, 0].astype(cache_k.dtype), mode="drop")
                    cache_v = cache_v.at[li, b_idx, pos].set(
                        v[:, 0].astype(cache_v.dtype), mode="drop")
                if mode == "noattn":
                    att = q[:, :1].reshape(B, 1, -1)
                else:
                    ck = cache_k[li]
                    cv = cache_v[li]
                    qh = q[:, 0].reshape(B, cfg.n_kv_heads, group, cfg.head_dim)
                    scores = jnp.einsum("bngd,bsnd->bngs", qh, ck,
                                        preferred_element_type=jnp.float32)
                    scores = scores * (1.0 / np.sqrt(cfg.head_dim))
                    scores = jnp.where(kmask[:, None, None, :], scores,
                                       -jnp.inf)
                    if mode in ("defer", "defer0"):
                        s_cur = jnp.einsum(
                            "bngd,bnd->bng", qh, k[:, 0].astype(qh.dtype),
                            preferred_element_type=jnp.float32)
                        s_cur = s_cur * (1.0 / np.sqrt(cfg.head_dim))
                        scores = jnp.concatenate(
                            [scores, s_cur[..., None]], axis=-1)
                    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                    if mode in ("defer", "defer0"):
                        att = (jnp.einsum("bngs,bsnd->bngd", probs[..., :S], cv)
                               + probs[..., S:] * v[:, 0][:, :, None, :].astype(x.dtype))
                    else:
                        att = jnp.einsum("bngs,bsnd->bngd", probs, cv)
                    att = att.reshape(B, 1, -1)
                x = x + _mm(att, blk["wo"])[..., : cfg.dim]
                x = x + _layer_ffn(cfg, blk, x)
            if mode == "defer":
                new_k = jnp.stack(new_ks)  # [L, B, KVH, HD]
                new_v = jnp.stack(new_vs)
                cache_k = cache_k.at[:n_layers, b_idx, pos].set(
                    new_k.astype(cache_k.dtype), mode="drop")
                cache_v = cache_v.at[:n_layers, b_idx, pos].set(
                    new_v.astype(cache_v.dtype), mode="drop")
            xn = rms_norm(x, w["output_norm"], cfg.rms_eps)
            if mode == "nologits":
                logits = jnp.broadcast_to(
                    xn[:, 0, :1].astype(jnp.float32),
                    (B, cfg.vocab_size))
            else:
                logits = _logits_matmul(cfg, w, xn[:, 0])
            return logits, cache_k, cache_v

        return step

    S = 512

    def timed(step, n):
        @jax.jit
        def loop(w, token, pos0, ck, cv):
            w = _prepare_decode_weights(w)  # int4 head: convert once/call

            def body(i, c):
                logits, ck, cv, pos = c
                logits, ck, cv = step(w, token, pos, ck, cv)
                return (logits, ck, cv, pos + 1)

            logits0 = jnp.zeros((lanes, cfg.vocab_size), jnp.float32)
            logits, ck, cv, pos = jax.lax.fori_loop(
                0, n, body, (logits0, ck, cv, pos0))
            return logits[:, 0].sum() + ck.sum().astype(jnp.float32) * 0.0

        token = jnp.full((lanes,), 5, jnp.int32)
        pos0 = jnp.full((lanes,), 8, jnp.int32)
        ck, cv = init_kv_cache(cfg, lanes, S)
        out = np.asarray(loop(w, token, pos0, ck, cv))  # compile + run
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(loop(w, token, pos0, ck, cv))
            best = min(best, time.perf_counter() - t0)
        return best

    variants = ["base", "defer", "defer0", "noattn", "nologits", "half",
                "ship", "shipxla"]
    names = sys.argv[1:] or variants
    for name in names:
        if name in ("ship", "shipxla"):
            # the shipped llm_decode_step (defer scatters + dispatched
            # attention). "ship" resolves auto — which is the XLA path
            # unless MIOTTS_DECODE_ATTN=pallas is exported; "shipxla" pins
            # XLA, so the pair only differs under that env override.
            import dataclasses

            scfg = (dataclasses.replace(cfg, decode_attn="xla")
                    if name == "shipxla" else cfg)

            def step(w, token, pos, ck, cv, _c=scfg):
                return llm_decode_step(_c, w, token, pos, ck, cv)

            t_a = timed(step, n1)
            t_b = timed(step, n2)
            per = (t_b - t_a) / (n2 - n1) * 1e3
            print(f"{name:9s} {per:7.3f} ms/step   (N{n1} {t_a*1e3:7.1f} ms, "
                  f"N{n2} {t_b*1e3:7.1f} ms)", flush=True)
            continue
        L = cfg.n_layers // 2 if name == "half" else cfg.n_layers
        mode = "base" if name == "half" else name
        step = make_step(mode, L)
        t_a = timed(step, n1)
        t_b = timed(step, n2)
        per = (t_b - t_a) / (n2 - n1) * 1e3
        print(f"{name:9s} {per:7.3f} ms/step   (N{n1} {t_a*1e3:7.1f} ms, "
              f"N{n2} {t_b*1e3:7.1f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
