"""Test harness: force JAX onto CPU with 8 virtual devices so mesh/collective
logic is exercised without TPUs (SURVEY.md §4c).

Note: this box's `sitecustomize` registers a tunneled TPU ("axon") platform
at interpreter start and force-sets jax_platforms — plain env vars are not
enough, so we override the config after importing jax but before any backend
is initialized.
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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
