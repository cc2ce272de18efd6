"""On-chip (Mosaic-compiled) kernel test suite — VERDICT r2 #8.

Unlike tests/conftest.py this does NOT force the CPU backend: these tests
compile the Pallas kernels for real and assert parity on the chip. Run on
the TPU host (ONE process at a time on this runtime — CLAUDE.md #8):

    PYTHONPATH=.:/root/.axon_site python -m pytest tpu_tests -q \
        2>&1 | tee TPU_TEST_r0N.log

Every test skips cleanly when no accelerator is present, so this suite is
inert under CI's CPU conftest-less invocation.
"""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tpu():
    import jax

    from gst_tacotron_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    if jax.default_backend() in ("cpu",):
        pytest.skip("no accelerator backend — on-chip suite is TPU-only")
    return jax.devices()[0]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
