"""Test config: force the CPU backend with 8 virtual devices so decode and
sharding tests run without TPU hardware (mirrors the reference's FAKE-build CI
stand-in, reference: cmake/hyperpose.fake.cmake, .github/workflows/ci.yml:41-45).

NOTE: this environment pre-imports jax with a TPU plugin at interpreter
startup, so env-var based platform selection is too late — we must use
jax.config.update before any backend is used.
"""
import os

# Suppress XLA:CPU AOT-loader machine-feature warnings: the persistent
# cache embeds tuning pseudo-features (+prefer-no-scatter/gather) that the
# loader's comparison flags as mismatches even on the SAME host.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: most of the suite's wall time is re-compiling
# near-identical jitted programs across test processes/runs; XLA:CPU AOT
# results are cacheable and cut repeat runs by an order of magnitude.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
