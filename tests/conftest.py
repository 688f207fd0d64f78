"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on host CPU devices via ``xla_force_host_platform_device_count``
(the standard JAX pattern for mesh tests). Pallas kernels are exercised in
interpreter mode on CPU and compiled on real TPU when present.
"""

import os

# XLA reads this at backend init; set before the first jax.devices() call.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize imports jax at interpreter boot with
# JAX_PLATFORMS=axon (real TPU), so env vars are too late here — override
# the live config instead. Tests always run on the virtual CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU (the
# 8-device shard_map programs dominate); warm runs cut minutes off. The
# cache lives outside the repo and is safe to delete any time.
jax.config.update("jax_compilation_cache_dir", "/tmp/ivars_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tmp_workspace(tmp_path):
    """A workspace directory with the standard path layout."""
    for sub in ("keyframes", "map", "index", ".cache", "logs"):
        (tmp_path / sub).mkdir()
    return tmp_path
