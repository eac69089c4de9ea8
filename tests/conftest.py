"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-device sharding tests (pjit/shard_map over a Mesh) run without TPU
hardware.

NOTE: this environment's sitecustomize pre-imports jax and registers an
'axon' TPU backend before conftest runs, so setting JAX_PLATFORMS in
os.environ here is too late — we must flip the already-imported config.
XLA_FLAGS is still honored because backends initialize lazily on first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xDEEFF)


def pytest_configure(config):
    # fail fast if the backend somehow isn't CPU (tests would silently run
    # over the slow TPU tunnel)
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8
