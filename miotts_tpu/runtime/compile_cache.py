"""Persistent XLA compilation cache.

First compiles of the jitted forwards take minutes (especially through
remote-compile relays); the persistent cache makes warm process starts
near-instant (measured here: 155 s -> 1.5 s across processes). Enabled by
default at model-load time; MIOTTS_COMPILE_CACHE overrides the directory,
MIOTTS_COMPILE_CACHE=0 disables.

This subsumes the reference's shape-keyed GPU graph-copy cache
(ggml-graph-copy-host.h) *across process restarts*, which the reference
cannot do.

Caveat (mixed-machine entries): under a remote-compile relay, XLA:CPU AOT
results can be produced on the relay host with machine features the local
VM lacks (avx512*, amx, +prefer-no-gather) — jax loads them anyway with a
"could lead to execution errors such as SIGILL" warning, and such loads
have intermittently segfaulted local-CPU processes. Processes that force
the CPU backend on a machine that also runs relay sessions should set
MIOTTS_COMPILE_CACHE to their own directory (tests/conftest.py does).
"""

from __future__ import annotations

import os
import threading

_done = False
_lock = threading.Lock()


def enable_compile_cache() -> str | None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    global _done
    with _lock:
        if _done:
            return None
        _done = True
        setting = os.environ.get("MIOTTS_COMPILE_CACHE", "")
        if setting in ("0", "off", "false"):
            return None
        cache_dir = setting or os.path.join(
            os.path.expanduser("~"), ".cache", "miotts_tpu", "jax_cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            return None
        return cache_dir
