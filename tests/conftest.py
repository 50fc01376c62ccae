"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the JAX-standard way to exercise
sharded code without TPU pods) with x64 enabled.  Environment must be set
before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; pin the default device to CPU
# so eager complex128 arrays never touch the TPU (which lacks complex128).
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture(scope="session")
def tables():
    from qnmfits_tpu.spectrum.tables import default_tables
    return default_tables()


@pytest.fixture(scope="session")
def synthetic_ringdown():
    """A known synthetic multimode ringdown for round-trip tests."""
    from qnmfits_tpu.testing import synthetic_multimode
    return synthetic_multimode()
