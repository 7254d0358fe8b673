"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native analogue of "test multi-node without a cluster":
sharding/collective code paths execute on 8 virtual CPU devices so they can
be validated anywhere (the driver separately dry-runs the multi-chip path).
"""
import os

# force CPU: tests must never ride the (slow, single-chip) TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
