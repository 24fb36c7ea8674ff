"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices, the
standard JAX pattern for testing pjit/shard_map layouts.
"""

import os

# Force CPU for unit tests (the ambient env pins JAX_PLATFORMS to the TPU
# tunnel); override with DH3D_TEST_PLATFORM=tpu to run the suite on hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("DH3D_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup (before this
# file runs), so the env vars above may be read too late — force the
# platform and device count through the live config as well.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite re-compiles many small graphs;
# cache across runs (single-core CPU machine, compiles dominate runtime).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
