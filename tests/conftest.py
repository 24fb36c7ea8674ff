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

# NO persistent compilation cache: jaxlib 0.9.0's XLA:CPU hoists large
# embedded constants into executable-internal buffers, and a deserialized
# cache entry for such a program expects them as RUNTIME arguments — any
# cache hit on a big-model forward then crashes at execute time with
# "Execution supplied K buffers but compiled program expected N".  The
# in-process tracing cache is unaffected; cross-run compile reuse is not
# worth silently-poisoned executables.  (Reproduced on the demo-data
# fidelity tests: second identical jit of the stage-3 forward.)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
