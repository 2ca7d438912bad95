"""Test config: run all tests on a virtual 8-device CPU mesh.

XLA collectives execute on CPU without a cluster, so distributed code paths are
exercised with `--xla_force_host_platform_device_count=8` (see SURVEY.md §4).

NOTE: this environment's axon sitecustomize calls jax.config programmatically,
which overrides the JAX_PLATFORMS env var — so we must also force the platform
via jax.config.update AFTER importing jax, or tests silently run on the single
real TPU chip through the tunnel (slow, and hangs under process contention).
"""
import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >1 min of XLA CPU compiles; run with --runslow"
    )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full model compiles, ~6 min extra)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="needs --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs
