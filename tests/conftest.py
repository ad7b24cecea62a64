"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY.md §4 testing-gap note).

Environment gotchas on this image (see .claude/skills/verify/SKILL.md):
  - `JAX_PLATFORMS=axon` is exported globally and jax is PRE-IMPORTED at
    interpreter startup by the axon plugin, so os.environ tweaks are too late;
    `jax.config.update("jax_platforms", ...)` still works because backends
    initialize lazily.
  - XLA_FLAGS is read at backend init, which happens on first device use —
    after this conftest runs — so setting it here is effective.
"""
import os

# the image exports JAX_PLATFORMS=axon globally and the package __init__
# HONORS that env (it re-applies it over any earlier jax.config.update, by
# design — see __init__.py:17), so overriding the env var itself is the only
# way to keep tests off the tunneled TPU: full f32 matmul precision,
# no tunnel flakiness, and benches can run on the chip concurrently
os.environ["JAX_PLATFORMS"] = "cpu"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False, help="run slow tests")
    parser.addoption(
        "--runheavy", action="store_true", default=False,
        help="run heavy (multi-minute compile) tests",
    )


def pytest_collection_modifyitems(config, items):
    run_slow = config.getoption("--runslow")
    run_heavy = config.getoption("--runheavy")
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    skip_heavy = pytest.mark.skip(reason="need --runheavy option to run")
    for item in items:
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)
        if "heavy" in item.keywords and not run_heavy:
            item.add_marker(skip_heavy)
