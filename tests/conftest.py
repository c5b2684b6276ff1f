"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use shard_map over these virtual devices; real-TPU
benchmarking happens in bench.py, not under pytest.
"""

import os

# The environment may export JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize that imports jax at interpreter startup — so env vars set
# here are too late; use jax.config.update instead. Tests must run on the
# local virtual-device CPU backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
