"""Test config: run everything on a virtual 8-device CPU mesh.

IMPORTANT (this environment): an `axon` sitecustomize force-registers the real TPU
and overrides jax_platforms at import time (env JAX_PLATFORMS is ignored). The only
reliable way to get the CPU backend is jax.config.update AFTER importing jax.
Multi-chip sharding is then validated without TPU hardware via XLA's host-platform
device-count override — coverage the reference lacks entirely (its scheduler tests
mock the GPU; see SURVEY.md §4).
"""

import os

# must be set before the cpu backend is initialized
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import jax

# beats both JAX_PLATFORMS=axon and the sitecustomize's config.update("axon,cpu")
jax.config.update("jax_platforms", "cpu")

# persistent compile cache makes repeated test runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
