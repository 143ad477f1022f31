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

    x0 = jnp.asarray(rng.randn(B, D), jnp.bfloat16)

    def quant_act(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.where(amax > 0, amax / 127.0, 1.0)
        return jnp.round(xf / sx).astype(jnp.int8), sx

    def body_bf16(x, wts):
        return jax.lax.dot_general(x, wts[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def body_quant(x, wts):
        q, s = wts
        x8, sx = quant_act(x)
        y = jax.lax.dot_general(x8, q.astype(jnp.int8),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * sx * s[None, :]

    # weights ride as jit ARGUMENTS (a closed-over device array becomes a
    # compile-time constant: executable bloat + a host round trip that is
    # UNIMPLEMENTED for int4 through the relay). int4 can't even be a jit
    # argument here (device_put relayout recursion through the relay), so
    # the int4 case passes int8 and converts ONCE inside the jit, behind an
    # optimization_barrier so the convert can't fold into the loop's dots.
    cases = {"bf16": (body_bf16, (w_bf16,), None),
             "int8": (body_quant, (q8, s8), None),
             "int4": (body_quant, (q4_i8, s4), "int4"),
             "int4u": (body_quant, (q4_i8, s4), None)}
    names = sys.argv[1:] or list(cases)
    print(f"devices={jax.devices()} B={B} head [{B},{D}]x[{D},{V}] "
          f"slope N {n1}->{n2}", file=sys.stderr)

    for name in names:
        body, wts, conv = cases[name]

        def loop_fn(x, wts, n, _body=body, _conv=conv):
            if _conv == "int4":
                q4w = jax.lax.optimization_barrier(
                    wts[0].astype(jnp.int4))
                wts = (q4w,) + tuple(wts[1:])

            def step(i, c):
                y = _body(c, wts)
                # feed a NON-LINEAR reduction over every output element
                # back: a slice invites DCE pushing it into the dot, and a
                # sum invites the algebraic rewrite dot(x,W)@1 -> x@(W@1)
                # with the reduced vector hoisted out of the loop (both
                # observed: int4 "measured" 16-29 us/call, below its
                # streaming roofline). max survives neither rewrite.
                return c + (jnp.max(y, axis=1, keepdims=True) * 1e-6
                            ).astype(c.dtype)

            return jax.lax.fori_loop(0, n, step, x)[:, :8].sum()

        loop = jax.jit(loop_fn, static_argnums=2)

        def run(n, _wts=wts):
            np.asarray(loop(x0, _wts, n))  # compile + run
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(x0, _wts, n))
                best = min(best, time.perf_counter() - t0)
            return best

        t_a, t_b = run(n1), run(n2)
        per = (t_b - t_a) / (n2 - n1) * 1e6
        print(f"{name:6s} {per:8.1f} us/call   (N{n1} {t_a*1e3:7.1f} ms, "
              f"N{n2} {t_b*1e3:7.1f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
