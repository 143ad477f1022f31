"""Decompose model load/upload time through the relay.

The warm-restart measurement (DESIGN.md "Server warm start") attributes
~50 s of the 122 s time-to-listening to model load/upload. This probe
splits that into: GGUF read+host prep, per-leaf device transfer, and a
packed one-buffer transfer of the same bytes (upper bound on what
transfer batching could save), plus the raw-Q8_0-upload + on-device
dequant alternative for the two giant vocab tensors.

Run on a free TPU: python scripts/bench_upload.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch_barrier(x):
    """Real d2h fetch — block_until_ready is not reliable via the relay."""
    import jax

    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[-1])[:1])


def main() -> int:
    import jax
    import jax.numpy as jnp

    from miotts_tpu.testing import (
        full_codec_config, write_synthetic_llm_gguf,
        write_synthetic_miocodec_gguf)

    tmp = tempfile.gettempdir()
    llm_path = os.path.join(tmp, "miotts_bench_llm_v2.gguf")
    q8_path = os.path.join(tmp, "miotts_bench_llm_q8.gguf")
    codec_path = os.path.join(tmp, "miotts_bench_codec.gguf")
    if not os.path.exists(codec_path):
        write_synthetic_miocodec_gguf(codec_path, full_codec_config(), seed=0)
    if not os.path.exists(llm_path):
        write_synthetic_llm_gguf(
            llm_path, n_audio=12800, dim=768, n_layers=12, n_heads=12,
            n_kv_heads=2, ffn=2048, seed=0, n_filler_vocab=138_700,
            audio_logit_scale=3.0)
    if not os.path.exists(q8_path):
        write_synthetic_llm_gguf(
            q8_path, n_audio=12800, dim=768, n_layers=12, n_heads=12,
            n_kv_heads=2, ffn=2048, seed=0, n_filler_vocab=138_700,
            audio_logit_scale=3.0, quant="q8_0")

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # -- LLM: host prep vs upload --------------------------------------------
    from miotts_tpu.models.llm import load_llm_gguf

    saved_deq = os.environ.get("MIOTTS_DEVICE_DEQUANT")
    # every row pins the mode explicitly so the labels mean the same thing
    # regardless of the ambient env (f32-src has no raw-quant path to save,
    # but the packed transfer itself is still mode-dependent)
    for path, tag, dev_deq in ((llm_path, "f32-src packed", "1"),
                               (llm_path, "f32-src per-leaf", "0"),
                               (q8_path, "q8-src host-deq", "0"),
                               (q8_path, "q8-src dev-deq", "1")):
        os.environ["MIOTTS_DEVICE_DEQUANT"] = dev_deq
        t0 = time.perf_counter()
        cfg, w, tok = load_llm_gguf(path)
        fetch_barrier(w)
        t1 = time.perf_counter()
        nbytes = sum(l.nbytes for l in jax.tree.leaves(w)
                     if hasattr(l, "nbytes"))
        print(f"llm[{tag}] load+upload: {t1 - t0:.1f}s "
              f"({nbytes / 1e6:.0f} MB on device)", flush=True)
        del w
    if saved_deq is None:
        os.environ.pop("MIOTTS_DEVICE_DEQUANT", None)
    else:
        os.environ["MIOTTS_DEVICE_DEQUANT"] = saved_deq

    # -- packed single-buffer transfer: the relay's best case ----------------
    for mb in (64, 256, 512):
        buf = np.zeros(mb * 1_000_000, np.uint8)
        t0 = time.perf_counter()
        x = jnp.asarray(buf)
        np.asarray(x[:1])
        dt = time.perf_counter() - t0
        print(f"packed {mb} MB upload: {dt:.1f}s = {mb / dt:.1f} MB/s",
              flush=True)
        del x

    # -- per-leaf shape-matched uploads (what the loader actually does) ------
    rng = np.random.RandomState(0)
    shapes = [(152_236, 768), (152_236, 768)] + [(768, 768)] * 24
    arrs = [rng.randn(*s).astype(np.float32) for s in shapes[:2]] + [
        rng.randn(*s).astype(np.float32) for s in shapes[2:]]
    t0 = time.perf_counter()
    dev_arrs = [jnp.asarray(a, dtype=jnp.bfloat16) for a in arrs]
    for d in dev_arrs:
        pass
    np.asarray(dev_arrs[-1][0, :1])
    np.asarray(dev_arrs[0][0, :1])
    dt = time.perf_counter() - t0
    total = sum(a.size * 2 for a in arrs)
    print(f"per-leaf bf16 uploads: {dt:.1f}s for {total / 1e6:.0f} MB "
          f"= {total / 1e6 / dt:.1f} MB/s", flush=True)
    del dev_arrs

    # -- raw-Q8_0 upload + on-device dequant for one [V, D] tensor -----------
    V, D = 152_236, 768
    nb = V * D // 32
    d_host = (rng.randn(nb).astype(np.float16) * 0.01)
    q_host = rng.randint(-127, 127, (nb, 32)).astype(np.int8)

    @jax.jit
    def deq(d, q):
        x = q.astype(jnp.float32) * d.astype(jnp.float32)[:, None]
        return x.reshape(V, D).astype(jnp.bfloat16)

    t0 = time.perf_counter()
    out = deq(jnp.asarray(d_host), jnp.asarray(q_host))
    np.asarray(out[0, :1])
    dt = time.perf_counter() - t0
    mb = (d_host.nbytes + q_host.nbytes) / 1e6
    print(f"raw-q8 upload+device-dequant [V,D]: {dt:.1f}s ({mb:.0f} MB up, "
          f"vs {V * D * 2 / 1e6:.0f} MB bf16)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
