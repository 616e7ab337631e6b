"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU chip; multi-chip sharding is validated on
the host-platform virtual devices, per the project testing strategy
(SURVEY.md §4). Note: this environment pins JAX_PLATFORMS=axon via
sitecustomize, so platform selection must go through jax.config, not the
environment variable."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
