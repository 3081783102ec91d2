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

# Persistent compilation cache for the CPU test programs: repeated suite
# runs (and Parallelize spawn workers — the pool initializer propagates the
# cache dir) skip recompiling the larger jitted programs. Machine-local
# (CPU executables are AOT-compiled for the exact host, hence NOT in the
# repo's .jax_cache).
_cache = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"diart_tpu_test_cache_{os.uname().nodename}"
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
