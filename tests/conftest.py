"""Test configuration: run everything on an 8-device virtual CPU mesh so the
suite is hardware-independent and sharding/psum paths are exercised without a
real TPU pod (SURVEY.md §4: distributed tests via
``xla_force_host_platform_device_count``)."""
import os

# Force a genuine CPU backend: the image's sitecustomize registers the axon
# TPU-tunnel PJRT plugin whenever PALLAS_AXON_POOL_IPS is set, which would
# route every test op over the network tunnel.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
