"""Test config: force CPU with 8 virtual devices so sharding/mesh tests run
anywhere (SURVEY.md §4 test strategy), and keep x64 off (TPU-realistic).

Note: the axon TPU plugin pins JAX_PLATFORMS in the environment, so the env
var alone does not stick — `jax.config.update` after import does.
"""
import os

# Must be set before the backend initializes (lazily, at first jax use).
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests get their own persistent-compile-cache dir: a pytest run sharing
# .jax_cache with a concurrent TPU job segfaulted inside the cache write
# (zstd) twice — cache contention between processes is not worth the reuse
# (CLI e2e tests call enable_compile_cache, which honors this override).
os.environ.setdefault("CAPTRA_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_tests"))
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
