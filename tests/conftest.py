"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding logic is exercised without TPU hardware (and so tests don't round
trip through the remote TPU tunnel).

Note: this image's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup with JAX_PLATFORMS=axon, so plain env manipulation in a
conftest is too late — use jax.config.update before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
