"""Test configuration: run everything on an 8-device virtual CPU mesh so the
suite is hardware-independent and sharding/psum paths are exercised without a
real TPU pod (SURVEY.md §4: distributed tests via
``xla_force_host_platform_device_count``).

The image's ``sitecustomize`` registers the axon TPU-tunnel PJRT plugin in
every python process *before* conftest runs and pins ``jax_platforms`` to the
tunnel; plain env vars are therefore too late. ``jax.config.update`` before
first backend init wins, so force the CPU backend here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
