"""Test config: force CPU with 8 virtual devices so sharding/mesh tests run
anywhere (SURVEY.md §4 test strategy), and keep x64 off (TPU-realistic).

Note: the axon TPU plugin pins JAX_PLATFORMS in the environment, so the env
var alone does not stick — `jax.config.update` after import does.
"""
import os

# Must be set before the backend initializes (lazily, at first jax use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
