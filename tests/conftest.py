"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native analogue of "test multi-node without a cluster":
sharding/collective code paths execute on 8 virtual CPU devices so they can
be validated anywhere (the driver separately dry-runs the multi-chip path).
"""
import os

# force CPU: tests must never ride the (slow, single-chip) TPU tunnel.
# NOTE: plugins (jaxtyping) import jax before this conftest runs, so the env
# var alone is too late — update the jax config as well (legal until the
# backend is initialized, which no plugin does at import time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # the 8 virtual device threads share one vCPU on this box; under load a
    # collective partner can be starved past the 40 s default, F-aborting
    # the whole pytest process in rendezvous.cc (seen with the dryrun test)
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_active_data_mesh():
    """Trainers/dryrun set the pallas data-mesh global; don't leak it into
    unsharded single-device kernel tests."""
    yield
    from synchformer_tpu.parallel import mesh

    mesh.set_active_data_mesh(None)
