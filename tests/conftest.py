"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports, so multi-chip sharding tests run hermetically without TPU hardware.
"""

import os

# Must happen before any jax import anywhere in the test session. Forced
# (not setdefault): the surrounding environment may preset JAX_PLATFORMS to
# a remote TPU platform, and the suite is designed to run hermetically on a
# virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env vars above are ignored when the surrounding environment preloads
# jax with a preset platform (e.g. a remote-TPU site hook); the config update
# still wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_superslomo")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
