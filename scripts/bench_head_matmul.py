#!/usr/bin/env python3
"""Microbench the 0.1B logits-head matmul variants on chip.

The decode step's single biggest item is the [B,768]x[768,152k] logits
head (~251 us bf16 = its HBM roofline; scripts/bench_decode_step.py).
W8A8 (output_int8) halves its bytes on the native MXU int8 path. This
bench asks whether int4 weight storage buys the next halving IN XLA —
i.e. whether `w4.astype(int8)` inside the dot streams packed int4 from
HBM and upcasts in registers, or materializes an int8 buffer first
(which would read like int8 + an extra pass).

Variants (each timed by in-jit repeat slope, N1 vs N2 — the relay floor
cancels):
  bf16   x_bf16 @ w_bf16 [D, V]
  int8   dynamic per-row int8 activations, int8 weights, int32 MXU dot
  int4   same activations, jnp.int4 weights upcast to int8 in-graph
  int4u  int4 weights pre-upcast OUTSIDE the loop (upper bound: pure
         int8 compute; the delta vs `int4` is the streaming upcast cost)

Usage: python scripts/bench_head_matmul.py [variant ...]
Env: MIOTTS_BENCH_LANES (8), MIOTTS_BENCH_N1 (64), MIOTTS_BENCH_N2 (320)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    if os.environ.get("MIOTTS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MIOTTS_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    from miotts_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()
    B = int(os.environ.get("MIOTTS_BENCH_LANES", "8"))
    n1 = int(os.environ.get("MIOTTS_BENCH_N1", "64"))
    n2 = int(os.environ.get("MIOTTS_BENCH_N2", "320"))
    D, V = 768, 151_552  # lane-aligned 152k-vocab head

    rng = np.random.RandomState(0)
    w = rng.randn(D, V).astype(np.float32) * 0.02
    w_bf16 = jnp.asarray(w, jnp.bfloat16)
    s8 = jnp.asarray(np.abs(w).max(axis=0) / 127.0, jnp.float32)
    q8 = jnp.asarray(np.round(w / np.asarray(s8)[None, :]), jnp.int8)
    s4 = jnp.asarray(np.abs(w).max(axis=0) / 7.0, jnp.float32)
    q4_i8 = jnp.asarray(
        np.clip(np.round(w / np.asarray(s4)[None, :]), -7, 7), jnp.int8)
    q4 = q4_i8.astype(jnp.int4)

    x0 = jnp.asarray(rng.randn(B, D), jnp.bfloat16)

    def quant_act(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(xf / sx).astype(jnp.int8), sx

    def body_bf16(x, _w=w_bf16):
        y = jax.lax.dot_general(x, _w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y

    def body_int8(x, _q=q8, _s=s8):
        x8, sx = quant_act(x)
        y = jax.lax.dot_general(x8, _q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * sx * _s[None, :]

    def body_int4(x, _q=q4, _s=s4):
        x8, sx = quant_act(x)
        y = jax.lax.dot_general(x8, _q.astype(jnp.int8),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * sx * _s[None, :]

    def body_int4u(x, _q=q4_i8, _s=s4):
        x8, sx = quant_act(x)
        y = jax.lax.dot_general(x8, _q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * sx * _s[None, :]

    bodies = {"bf16": body_bf16, "int8": body_int8, "int4": body_int4,
              "int4u": body_int4u}
    names = sys.argv[1:] or list(bodies)
    print(f"devices={jax.devices()} B={B} head [{B},{D}]x[{D},{V}] "
          f"slope N {n1}->{n2}", file=sys.stderr)

    for name in names:
        body = bodies[name]

        def loop_fn(x, n, _body=body):
            def step(i, c):
                y = _body(c)
                # feed a cheap function of y back so the loop can't hoist
                return c + (y[:, :1].astype(c.dtype) * 1e-6)

            return jax.lax.fori_loop(0, n, step, x)[:, :8].sum()

        loop = jax.jit(loop_fn, static_argnums=1)

        def run(n):
            np.asarray(loop(x0, n))  # compile + run
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(x0, n))
                best = min(best, time.perf_counter() - t0)
            return best

        t_a, t_b = run(n1), run(n2)
        per = (t_b - t_a) / (n2 - n1) * 1e6
        print(f"{name:6s} {per:8.1f} us/call   (N{n1} {t_a*1e3:7.1f} ms, "
              f"N{n2} {t_b*1e3:7.1f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
