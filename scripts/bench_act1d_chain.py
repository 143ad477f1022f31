"""In-graph per-call cost of the fused Activation1d kernel: chain N calls
inside ONE jit (exactly how the vocoder uses it) and take the slope between
N=2 and N=10 — the relay dispatch/fetch floor cancels.

Usage: python scripts/bench_act1d_chain.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from miotts_tpu.ops.pallas import activation1d as mod  # noqa: E402

B, T, C = 2, 245760, 128


def run_chain(n, x, lengths, fu, alpha, beta, fd, ablate, bt=512,
              sincos="fast"):
    fu2 = fu.reshape(1, -1)
    fd2 = fd.reshape(1, -1)

    @jax.jit
    def chain(x):
        y = x
        for _ in range(n):
            y = mod._fused_call(y, lengths, fu2, fd2,
                                jnp.exp(alpha).reshape(1, -1),
                                (1.0 / (2.0 * (jnp.exp(beta) + 1e-9))
                                 ).reshape(1, -1),
                                int(fu2.shape[1]), int(fd2.shape[1]), bt,
                                False, ablate, sincos)
            y = y * 0.99  # keep values bounded through deep chains
        return y[0, :1, :1]

    np.asarray(chain(x))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chain(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    rng = np.random.RandomState(0)
    k = 12
    f = np.hanning(k + 2)[1:-1].astype(np.float32)
    f /= f.sum()
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    lengths = jnp.asarray([T, T - 1000], jnp.int32)
    alpha = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    fu = jnp.asarray(f)
    fd = jnp.asarray(f)
    print(f"devices={jax.devices()} shape=[{B},{T},{C}] k={k}")
    abls = os.environ.get("MIOTTS_CHAIN_ABLS", "copy,nosnake,nofir,full")
    bts = [int(b) for b in os.environ.get(
        "MIOTTS_CHAIN_BTS", "512").split(",")]
    scs = os.environ.get("MIOTTS_CHAIN_SINCOS", "fast").split(",")
    for bt in bts:
        for sc in scs:
            for ab in abls.split(","):
                t2 = run_chain(2, x, lengths, fu, alpha, beta, fd, ab, bt, sc)
                t10 = run_chain(10, x, lengths, fu, alpha, beta, fd, ab, bt,
                                sc)
                per = (t10 - t2) / 8
                print(f"bt={bt:4d} sincos={sc:4s} {ab:10s} "
                      f"N=2 {t2 * 1e3:7.1f} ms  N=10 {t10 * 1e3:7.1f} ms "
                      f"-> {per * 1e3:6.2f} ms/call in-graph", flush=True)


if __name__ == "__main__":
    main()
