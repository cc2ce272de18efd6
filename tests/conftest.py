"""Test harness: force an 8-device CPU mesh before JAX initializes.

SURVEY.md §4 "Distributed without a cluster": all sharding/collective tests
run against a fake 8-device host platform so they are hardware-independent.
This must happen before the first `import jax` anywhere in the test process.
"""

import os

# The sandbox pins JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") in every
# interpreter. Unit tests must run on the local CPU backend, so override both
# the env var AND the already-applied jax config (backend init is lazy, so
# this is safe as long as no computation has run yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
