"""Test environment: force an 8-device virtual CPU mesh so multi-chip sharding
code is exercised without TPU hardware (the TPU analog of the reference's
missing "multi-node without a cluster" testing — see SURVEY.md §4).

Note: the `axon` TPU plugin ignores the JAX_PLATFORMS env var, so we must
also call jax.config.update after import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
