import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding
# paths compile and execute without TPU hardware (SURVEY.md section 4).
# Force (not setdefault): the environment may carry JAX_PLATFORMS=axon.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# pin the test backend explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def golden_dir():
    return os.path.join(os.path.dirname(__file__), "golden")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
