"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY.md §4 testing-gap note). Must run before jax imports."""
import os

# NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS=cpu (the tpu
# backend stays default); JAX_PLATFORM_NAME=cpu does demote it.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False, help="run slow tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
