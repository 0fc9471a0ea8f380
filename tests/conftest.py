"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): all sharding tests run against
--xla_force_host_platform_device_count=8.

Note the axon sitecustomize imports jax at interpreter start and programs
jax_platforms to "axon,cpu"; backends initialize lazily, so overriding the
config + XLA_FLAGS here (before any backend is touched) still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity-grade matmul precision on all backends.
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")
