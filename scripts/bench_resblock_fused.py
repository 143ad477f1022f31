#!/usr/bin/env python3
"""In-graph cost of ONE fused resblock layer vs the unfused 4-op chain
(chain-of-N slope, relay floor cancels). Usage:
    python scripts/bench_resblock_fused.py [bt_list] [dil_list]
"""
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from miotts_tpu.models import vocoder as V  # noqa: E402
from miotts_tpu.ops.pallas.resblock import fused_resblock_layer  # noqa: E402

B, T, C = 4, 122880, 128


def main():
    bts = [int(b) for b in (sys.argv[1] if len(sys.argv) > 1
                            else "96,160,256").split(",")]
    dils = [int(d) for d in (sys.argv[2] if len(sys.argv) > 2
                             else "1,5").split(",")]
    rng = np.random.RandomState(0)
    k = 12
    f = np.hanning(k + 2)[1:-1].astype(np.float32)
    f /= f.sum()
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    lengths = jnp.asarray([T] * B, jnp.int32)
    act = {"alpha": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
           "beta": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
           "up_filter": jnp.asarray(f), "down_filter": jnp.asarray(f)}
    w1 = jnp.asarray(rng.randn(C, C, 3).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    def composite(xs, ls, dil):
        r1, l1 = V.activation1d(xs, ls, act, impl="pallas")
        r2 = V.conv1d_same(r1, l1, w1, b1, dil, impl="pallas")
        r3, l3 = V.activation1d(r2, l1, act, impl="pallas")
        return V.conv1d_same(r3, l3, w1, b1, 1, residual=xs, impl="pallas")

    def slope(mk):
        def chain(n):
            @jax.jit
            def f(x):
                y = x
                for _ in range(n):
                    y = mk(y) * 0.98
                return y[0, :1, :1]
            return f
        c2, c6 = chain(2), chain(6)
        np.asarray(c2(x)), np.asarray(c6(x))

        def best(fn):
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(fn(x))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return (best(c6) - best(c2)) / 4

    print(f"devices={jax.devices()} [{B},{T},{C}] k_act={k} k_conv=3")
    for dil in dils:
        t = slope(lambda y, d=dil: composite(y, lengths, d))
        print(f"unfused chain dil={dil}: {t * 1e3:7.2f} ms/layer", flush=True)
        for bt in bts:
            t = slope(lambda y, d=dil, b=bt: fused_resblock_layer(
                y, lengths, act, w1, b1, d, act, w1, b1,
                lambda xs, ls, dd=d: composite(xs, ls, dd), block_t=b))
            print(f"fused bt={bt:4d} dil={dil}: {t * 1e3:7.2f} ms/layer",
                  flush=True)


if __name__ == "__main__":
    main()
