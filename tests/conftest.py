"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host platform and splitting it into 8 virtual devices (SURVEY.md §4).

NOTE: the axon TPU sitecustomize imports jax at interpreter startup, so
env-var changes here are too late — the platform must be switched through
``jax.config`` (works as long as no computation ran yet). The device-count
XLA flag is env-read lazily at backend init, so setting it here still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} on "
    f"{jax.devices()[0].platform}")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
