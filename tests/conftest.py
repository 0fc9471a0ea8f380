"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): all sharding tests run against
--xla_force_host_platform_device_count=8.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Parity-grade matmul precision on all backends.
jax.config.update("jax_default_matmul_precision", "highest")
