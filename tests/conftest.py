"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh: the TPU-native answer to "test
multi-chip behavior without a pod" is XLA's host-platform device-count
override, which gives real (if slow) executions of the same sharded
programs that run on ICI-connected chips.
"""

import os

# Must be set before jax initializes its backends.  Force CPU even when the
# session environment points at a TPU: tests must be hermetic and exercise
# the 8-device mesh.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The session's TPU plugin force-selects its platform regardless of the env
# var; the config option wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(16807)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-size oracle-parity tests (minutes each; run by default, "
        "deselect with -m 'not slow')",
    )
