"""On-chip cost decomposition of the fused Activation1d kernel.

Variants (MIOTTS_ACT1D_ABLATE): full | nosnake (identity instead of the
ADAA snake — isolates the FIR cost) | nofir (snake on the raw window —
isolates the snake cost). Plus block_t sweep. Numbers feed the kernel
optimization decisions in DESIGN.md.

Usage: python scripts/bench_act1d_variants.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from miotts_tpu.ops.pallas.activation1d import fused_activation1d  # noqa: E402

B, T, C = 2, 245760, 128  # real stage-4 shape (mel 512, rates 5*4*4*3*2)


def timed(label, fn, *args, iters=6):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0][0, :1, :1])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0][0, :1, :1])
        times.append(time.perf_counter() - t0)
    # subtract nothing; tiny fetch keeps the relay cost ~constant (~10ms)
    dt = min(times)
    print(f"{label:40s} {dt * 1e3:8.2f} ms")
    return dt


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
    import os

    for bt in (512,):
        for ab in ("copy", "full", "nosnake", "nofir"):
            os.environ["MIOTTS_ACT1D_ABLATE"] = ab
            try:
                timed(f"bt={bt} {ab}",
                      lambda xx: fused_activation1d(
                          xx, lengths, fu, alpha, beta, fd, block_t=bt)[0], x)
            except Exception as e:
                print(f"bt={bt} {ab}: FAILED {type(e).__name__}: {e}")
    os.environ.pop("MIOTTS_ACT1D_ABLATE", None)


if __name__ == "__main__":
    main()
