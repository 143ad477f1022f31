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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
