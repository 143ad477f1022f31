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
# Isolate the suite's persistent compile cache from the default dir shared
# with axon-relay sessions: those sessions can write XLA:CPU AOT entries
# compiled on the relay host, whose machine features (avx512*, amx,
# +prefer-no-gather) this VM lacks — loading such an entry in a CPU test
# warns "could lead to execution errors such as SIGILL" and intermittently
# segfaulted the full suite inside backend_compile_and_load.
os.environ.setdefault(
    "MIOTTS_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "miotts_tpu",
                 "jax_cache_cpu_suite"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
