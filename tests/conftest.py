"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths can be exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU: the ambient environment may route jax at real TPU hardware
# (a tunnel backend with remote compilation, ~80s per compile).  jax is
# typically already imported by sitecustomize before this file runs, so
# the env var is too late -- use the config API, which always works.
# BENSOLVE_TPU=1 opts out (used to run the large acceptance tests,
# tests/test_e2e_large.py, on the real chip).
if os.environ.get("BENSOLVE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running acceptance tests")


REFERENCE_EX = "/root/reference/ex"


@pytest.fixture(scope="session")
def ex_dir():
    return REFERENCE_EX
