"""Test config: force the CPU backend with 8 virtual devices so decode and
sharding tests run without TPU hardware (mirrors the reference's FAKE-build CI
stand-in, reference: cmake/hyperpose.fake.cmake, .github/workflows/ci.yml:41-45).

NOTE: this environment pre-imports jax with a TPU plugin at interpreter
startup, so env-var based platform selection is too late — we must use
jax.config.update before any backend is used.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
