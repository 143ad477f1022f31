"""On-chip exactness check: the Pallas fused Activation1d (including the
approx-reciprocal sinc path, which only runs on real TPU) vs the unfused
XLA composite, at a production-like shape with ragged lengths.

Usage: python scripts/check_act1d_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from miotts_tpu.models.vocoder import (  # noqa: E402
    adaa_snake_beta, downsample_activation, upsample_activation,
)
from miotts_tpu.ops.masking import mask_time  # noqa: E402
from miotts_tpu.ops.pallas.activation1d import fused_activation1d  # noqa: E402


def main():
    os.environ.pop("MIOTTS_ACT1D_ABLATE", None)
    rng = np.random.RandomState(0)
    B, T, C, k = 2, 20480, 128, 12
    f = np.hanning(k + 2)[1:-1].astype(np.float32)
    f /= f.sum()
    lengths = np.asarray([T, T - 777], np.int32)
    x = mask_time(jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.5),
                  jnp.asarray(lengths))
    alpha = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    import jax

    with jax.default_matmul_precision("float32"):  # like vocoder_decode
        y, ln = upsample_activation(x, jnp.asarray(lengths), jnp.asarray(f))
        y = adaa_snake_beta(y, ln, alpha, beta)
        y_ref, _ = downsample_activation(y, ln, jnp.asarray(f))
    y_p, _ = fused_activation1d(x, jnp.asarray(lengths), jnp.asarray(f),
                                alpha, beta, jnp.asarray(f))
    ref = np.asarray(y_ref, np.float32)
    got = np.asarray(y_p, np.float32)
    err = np.abs(got - ref).max()
    rel = err / max(1e-9, np.abs(ref).max())
    print(f"max abs err {err:.3e}  rel {rel:.3e}  "
          f"({'OK' if rel < 1e-5 else 'FAIL'})")
    assert rel < 1e-5, rel


if __name__ == "__main__":
    main()
