"""Test configuration: force JAX onto 8 virtual CPU devices.

Must run before the first ``import jax`` anywhere in the test process so the
sharding tests (the fake-backend analogue of the reference's Dummy stores,
SURVEY §4) see a multi-device platform without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_caches():
    from mmrag_tpu.cache import clear_all_caches

    clear_all_caches()
    yield
    clear_all_caches()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
