"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths can be exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_EX = "/root/reference/ex"


@pytest.fixture(scope="session")
def ex_dir():
    return REFERENCE_EX
