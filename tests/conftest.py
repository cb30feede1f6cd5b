"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver separately dry-runs multichip via __graft_entry__).

Note: this container's sitecustomize registers the remote `axon` TPU backend
and forces jax_platforms="axon,cpu" via jax.config.update, which overrides
the JAX_PLATFORMS env var — so we must override the config back AFTER jax
imports. Also disable the registration path up front when possible.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
