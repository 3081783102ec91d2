"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding semantics are
identical on the XLA CPU backend, so every sharding/pjit test runs against
8 virtual CPU devices (same XLA partitioner as on real TPU meshes).

Note: the environment pins ``JAX_PLATFORMS=axon`` via sitecustomize (the
remote-TPU tunnel), so the env var cannot be used to select the CPU backend;
``jax.config.update`` wins over it.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
