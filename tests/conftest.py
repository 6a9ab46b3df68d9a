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

import pytest  # noqa: E402

# Modules dominated by full-model jit compiles (minutes each on the 1-CPU
# box). `pytest -m "not slow"` runs the fast ops/config/data/eval subset
# for a quick green signal; the full suite still runs everything.
_SLOW_MODULES = {
    "test_pallas_sparse",
    "test_sparse_conv",
    "test_centerpoint_model",
    "test_mask2former",
    "test_voxel_detr",
    "test_conquer",
    "test_fcos",
    "test_retinanet_autoassign",
    "test_tracking",
    "test_motion_pretrain",
    "test_reference_stage_parity",
    "test_backbones_misc",
    "test_hooks",
    "test_data_pipeline",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
