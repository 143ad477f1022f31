"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths can be exercised without TPU hardware.

Note: this machine's sitecustomize registers an 'axon' TPU PJRT plugin and
hard-sets jax_platforms='axon,cpu'; overriding the config *after* jax import
(but before any backend use) wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# The suite runs with the persistent compile cache DISABLED (round 5):
# XLA:CPU's deserialize_executable intermittently SEGFAULTS (~70% of full
# runs) loading an AOT entry written earlier in the same run (observed at
# test_wavlm via compilation_cache.get_executable_and_time; allocator-
# sensitive — the crash vanishes under MALLOC_CHECK_=3). Round 4 already
# had to isolate the suite dir from relay-host entries (SIGILL class);
# round 5's in-run flake closes the remaining hole by not reading AOT
# entries at all. Costs ~6 min of cold compiles per full run; CLI/server
# production processes keep their caches. MIOTTS_COMPILE_CACHE=dir
# re-enables a cache for targeted debugging.
os.environ.setdefault("MIOTTS_COMPILE_CACHE", "off")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if os.environ.get("MIOTTS_COMPILE_CACHE") == "off":
    jax.config.update("jax_enable_compilation_cache", False)
