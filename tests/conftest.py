"""Test config: run all tests on a virtual 8-device CPU mesh.

XLA collectives execute on CPU without a cluster, so distributed code paths are
exercised with `--xla_force_host_platform_device_count=8` (see SURVEY.md §4).
Must be set before jax initializes its backends.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
