"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Two subtleties of this environment:
- ``XLA_FLAGS`` must be set before the CPU backend initializes (import time).
- The axon TPU plugin's sitecustomize calls
  ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter startup,
  overriding the ``JAX_PLATFORMS`` env var — so we must update the config
  *after* importing jax, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
