"""Test configuration: force JAX onto 8 virtual CPU devices.

The container's sitecustomize registers the axon TPU plugin and overrides
``JAX_PLATFORMS`` from inside jax's config, so the env var alone is NOT
enough — ``jax.config.update('jax_platforms', 'cpu')`` must run before any
backend initialization. XLA_FLAGS must be set before first jax import. The
8-device CPU mesh is the fake-backend analogue of the reference's Dummy
stores (SURVEY §4) for sharding tests.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

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
