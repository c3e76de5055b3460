"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests emulate an 8-device mesh on CPU
(--xla_force_host_platform_device_count), per SURVEY.md §4's test strategy.
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env pre-sets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the axon TPU plugin force-sets jax_platforms at import; override it back
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")


@pytest.fixture
def rng():
    return np.random.RandomState(20240817)
