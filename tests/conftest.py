"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's host-platform
device-count override — the approach the reference lacks entirely (its scheduler
tests mock the GPU; see SURVEY.md §4).
"""

import os

# must be set before jax is imported anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import jax

# persistent compile cache makes repeated test runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# this environment's CPU backend runs f32 matmuls at reduced (bf16-like) precision by
# default; numeric parity tests need the real thing
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
