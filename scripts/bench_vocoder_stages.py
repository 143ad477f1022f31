"""On-chip decomposition of the mel-vocoder forward (bench mode `vocoder`).

Times each op family at the production stage shapes (ch=128, rates
5*4*4*3*2, 2 lanes, 256 mel frames) by repeating it inside ONE jit and
fetching a scalar — per-call relay floor is ~10 ms, so per-op dispatch
timing through the relay is meaningless (CLAUDE.md).

Usage: python scripts/bench_vocoder_stages.py [reps=8]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from miotts_tpu.models.vocoder import (  # noqa: E402
    activation1d, conv1d_zeropad, highpass, julius_lowpass_kernel, lowpass,
    mask_time, zero_stuff,
)

B = 2
CH = 128
MEL_T = 512
RATES = (5, 4, 4, 3, 2)


def stage_lengths():
    out = []
    t = MEL_T
    for r in RATES:
        t *= r
        out.append(t)
    return out  # [1280, 5120, 20480, 61440, 122880]


_BASELINE_MS = {}


def timed(name, fn, *args, reps=16, key=None):
    """jit fn repeated `reps` times inside one executable; the carry
    perturbs the first argument each iteration so XLA cannot hoist the
    loop-invariant op out of the fori_loop. The cost of that perturbation
    pass (one elementwise add at the input shape) plus the dispatch floor
    is measured via an identity `fn` at the same shape and subtracted."""

    def body(x0, args):
        def one(i, carry):
            a0 = args[0] + carry * jnp.float32(1e-30)
            y = fn(a0, *args[1:])
            leaf = jax.tree.leaves(y)[0]
            return carry + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, one, x0)

    jf = jax.jit(body)
    args = jax.tree.map(jnp.asarray, args)
    np.asarray(jf(jnp.float32(0.0), args))  # compile + run once
    t0 = time.perf_counter()
    n_outer = 2
    for _ in range(n_outer):
        r = jf(jnp.float32(0.0), args)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / (n_outer * reps) * 1e3
    base = 0.0
    if key is not None:
        if key not in _BASELINE_MS:
            _BASELINE_MS[key] = timed(f"  [baseline {key}]",
                                      lambda x, l: x, args[0], args[1],
                                      reps=reps)
        base = _BASELINE_MS[key]
    print(f"{name:55s} {max(0.0, dt - base):8.3f} ms/call (raw {dt:.3f})")
    return max(0.0, dt - base)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.RandomState(0)
    lens = stage_lengths()
    filt12 = np.hanning(14)[1:-1].astype(np.float32)
    filt12 /= filt12.sum()
    alpha = rng.randn(CH).astype(np.float32) * 0.1
    act = {"up_filter": jnp.asarray(filt12), "down_filter": jnp.asarray(filt12),
           "alpha": jnp.asarray(alpha), "beta": jnp.asarray(alpha)}

    total_est = 0.0
    print(f"devices={jax.devices()} reps={reps}")
    print("--- per-stage op costs (x [B, T, 128] f32) ---")
    for i, (rate, t_out) in enumerate(zip(RATES, lens)):
        t_in = t_out // rate
        x = rng.randn(B, t_out, CH).astype(np.float32)
        lengths = np.full(B, t_out, np.int32)
        x_in = rng.randn(B, t_in, CH).astype(np.float32)
        len_in = np.full(B, t_in, np.int32)
        x0 = rng.randn(B, MEL_T, CH).astype(np.float32)
        len0 = np.full(B, MEL_T, np.int32)
        upp = t_out // MEL_T
        w3 = rng.randn(CH, CH, 3).astype(np.float32) * 0.05
        b3 = rng.randn(CH).astype(np.float32) * 0.01
        w7 = rng.randn(CH, CH, 7).astype(np.float32) * 0.05
        w1 = rng.randn(CH, CH).astype(np.float32) * 0.05

        d_act = timed(f"stage{i} T={t_out} activation1d (pallas)",
                      lambda x, l, a=act: activation1d(x, l, a)[0],
                      x, lengths, reps=reps, key=t_out)
        d_conv = timed(f"stage{i} T={t_out} resblock conv k=3 dense",
                       lambda x, l: mask_time(
                           conv1d_zeropad(x, w3, b3, 1, 1), l),
                       x, lengths, reps=reps, key=t_out)
        d_stuff_lp = timed(
            f"stage{i} T={t_in}->{t_out} zero_stuff+lowpass (signal up)",
            lambda x, l, r=rate: lowpass(zero_stuff(mask_time(x, l), r),
                                         l * r, 0.5 / r, 1)[0],
            x_in, len_in, reps=reps, key=t_in)
        d_noise = timed(
            f"stage{i} T={t_out} noise path (stuff+conv7+highpass)",
            lambda x, l, u=upp, r=rate: highpass(
                mask_time(conv1d_zeropad(zero_stuff(mask_time(x, l), u),
                                         w7, b3, 1, 3), l * u),
                l * u, 0.5 / r),
            x0, len0, reps=reps, key=MEL_T)
        d_merge = timed(f"stage{i} T={t_out} 1x1 merge + mask",
                        lambda x, l: mask_time(x @ w1 + b3, l),
                        x, lengths, reps=reps, key=t_out)
        for dd in (3, 5):
            timed(f"stage{i} T={t_out} resblock conv k=3 dil={dd}",
                  lambda x, l, d=dd: mask_time(
                      conv1d_zeropad(x, w3, b3, d, d), l),
                  x, lengths, reps=reps, key=t_out)
        # per stage: 18 act1d + 18 conv + 1 stuff_lp + 1 noise + 1 merge
        total_est += 18 * d_act + 18 * d_conv + d_stuff_lp + d_noise + d_merge
    print(f"--- estimated vocoder total from pieces: {total_est:.1f} ms "
          f"(measured full forward ~556 ms at these shapes) ---")


if __name__ == "__main__":
    main()
