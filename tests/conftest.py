"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX substitute
is forcing 8 host-platform CPU devices, which gives real (if slow) executions
of every pjit/shard_map/collective path.

NOTE: under the axon TPU plugin in this image, the ``JAX_PLATFORMS`` env var
and ``--xla_force_host_platform_device_count`` XLA flag are IGNORED — the
plugin registers itself as default regardless. The working recipe is the
``jax_platforms`` + ``jax_num_cpu_devices`` config knobs set before first
backend use, as below.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import os  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (many-minute) checks, e.g. the "
        "flagship-shape train-step compile")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, "virtual 8-device CPU mesh not active"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference snapshot not mounted")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
