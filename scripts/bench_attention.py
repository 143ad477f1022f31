#!/usr/bin/env python3
"""Microbenchmark the banded-attention implementations on the current device.

Production codec shapes: B=8 serving lanes, H=12 heads, D=64, window 65;
T sweeps the prenet/decoder sequence-length buckets. Timed with a packed
np.asarray fetch (block_until_ready is not a barrier through the TPU relay).

Usage: python scripts/bench_attention.py [T ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from miotts_tpu.ops.attention import (
    banded_attention_blocked, banded_attention_dense,
)
from miotts_tpu.ops.pallas.banded_attention import banded_attention_pallas
from miotts_tpu.runtime.compile_cache import enable_compile_cache


def main():
    enable_compile_cache()
    Ts = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024, 2048]
    B, H, D, window = 8, 12, 64, 65
    rng = np.random.RandomState(0)
    dense_j = jax.jit(banded_attention_dense, static_argnums=4)
    blocked_j = jax.jit(banded_attention_blocked, static_argnums=(4, 5))

    def fold(x):
        Bb, T, Hh, Dd = x.shape
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(Bb * Hh, T, Dd)

    print(f"device={jax.devices()[0]} B={B} H={H} D={D} window={window}")
    header = ["T", "dense", "blocked"] + [f"pallas{bq}" for bq in (64, 128, 256)]
    print("  ".join(f"{h:>9}" for h in header))
    for T in Ts:
        q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
        lengths = jnp.asarray([T] * B, jnp.int32)
        qf, kf, vf = fold(q), fold(k), fold(v)
        lf = jnp.repeat(lengths, H)

        def timeit(fn, n=20):
            np.asarray(fn())  # compile + warm
            np.asarray(fn())
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            np.asarray(r)  # one fetch barrier at the end
            return (time.perf_counter() - t0) / n * 1e3

        row = [f"{T:>9}"]
        if T <= 2048:
            row.append(f"{timeit(lambda: dense_j(q, k, v, lengths, window)):>8.3f}")
        else:
            row.append(f"{'-':>9}")
        row.append(f"{timeit(lambda: blocked_j(q, k, v, lengths, window, 128)):>8.3f}")
        for bq in (64, 128, 256):
            try:
                row.append(f"{timeit(lambda: banded_attention_pallas(qf, kf, vf, lf, window, block_q=bq)):>8.3f}")
            except Exception as e:
                row.append(f"ERR")
                print(f"pallas bq={bq} T={T}: {type(e).__name__}: {e}",
                      file=sys.stderr)
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
