"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-native analogue of a fake backend (SURVEY §4): multi-chip
sharding paths are validated on host-platform virtual devices, exactly how the
driver's ``dryrun_multichip`` exercises them.
"""

import os

# The session environment may pin JAX_PLATFORMS to the real TPU (axon);
# jax.config.update after import is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, devices
    return devices
