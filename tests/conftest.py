"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual devices (the reference cannot do
this at all with NCCL; with XLA it is a one-flag affair). Must run before the
first ``import jax`` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough on hosts where a TPU platform plugin is
# force-registered via sitecustomize; the config update always wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
