#!/usr/bin/env python3
"""Relay window-health probe. Prints ONE JSON line:

    {"probe": "window", "small_rtt_ms": ..., "fetch_mb_s": ...,
     "dispatch_fetch_ms": ..., "healthy": true|false, "t": "..."}

Healthy bar (round-4 verdict item 2): small-RTT <= 15 ms and fetch
>= 10 MB/s. Run this BEFORE and AFTER every on-chip measurement session
and record the line next to the numbers — a degraded relay window
(observed: 4-6x depressed) must never masquerade as a code regression.

NOTE: axon plugin init BLOCKS while another process holds the TPU
(CLAUDE.md); invoke under `timeout 120`. A timeout is itself a signal
(chip busy or relay wedged), distinct from a measured-degraded window.
"""
import datetime
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    dev = jax.devices()[0]
    out: dict = {"probe": "window",
                 "t": datetime.datetime.now().isoformat(timespec="seconds"),
                 "device": str(dev)}

    # small-RTT: tiny jit dispatch + scalar fetch. block_until_ready is not
    # a reliable barrier through the relay (CLAUDE.md) — fetch with
    # np.asarray. First call compiles; discard it.
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.float32(3.0)
    np.asarray(f(x))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(f(x))
        rtts.append((time.perf_counter() - t0) * 1e3)
    out["small_rtt_ms"] = round(float(np.median(rtts)), 1)
    out["small_rtt_min_ms"] = round(float(np.min(rtts)), 1)

    # fetch bandwidth: 16 MB device->host, median of 3. A jax.Array caches
    # its host value after the first np.asarray, so each sample must fetch
    # a FRESH device array (distinct key -> distinct output buffer).
    mk = jax.jit(lambda k: jax.random.normal(k, (2048, 2048)))
    np.asarray(mk(jax.random.PRNGKey(0)))  # compile
    bws = []
    for i in range(3):
        big = mk(jax.random.PRNGKey(i + 1))
        time.sleep(0.05)  # let dispatch complete so we time the fetch
        t0 = time.perf_counter()
        np.asarray(big)
        bws.append(big.size * 4 / 1e6 / (time.perf_counter() - t0))
    out["fetch_mb_s"] = round(float(np.median(bws)), 1)

    # compound dispatch+fetch floor on a small matmul (the shape class a
    # decode step's scalar fetches ride)
    g = jax.jit(lambda a: (a @ a).sum())
    a = jnp.ones((256, 256), jnp.bfloat16)
    np.asarray(g(a))
    ds = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(g(a))
        ds.append((time.perf_counter() - t0) * 1e3)
    out["dispatch_fetch_ms"] = round(float(np.median(ds)), 1)

    out["healthy"] = bool(out["small_rtt_ms"] <= 15.0
                          and out["fetch_mb_s"] >= 10.0)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
