"""Test configuration: force CPU with 8 virtual devices.

The reference has no CPU path at all (SURVEY.md §4); this suite deliberately runs
everywhere by (a) forcing the CPU backend so Pallas kernels run in interpreter mode
(see leetcuda_tpu.core.runtime.interpret_default) and (b) exposing 8 virtual devices
so the sharding/collective layer is tested without TPU hardware. Must run before
jax initializes — keep this at import time, first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon: tests always run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter start
# (see /root/.axon_site/axon/register/pjrt.py); override it back before any backend
# initializes so the suite runs on the 8-device virtual-CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full engine/model runs)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full engine/model-level run; skipped by default "
        "(pytest --runslow or CI runs everything)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow (CI does)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
