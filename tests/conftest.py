"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is validated on a virtual CPU mesh (no pod
needed).  The environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel), so
the env var alone is not enough -- ``jax.config`` must be updated before
any backend initializes, hence this runs at conftest import time.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
