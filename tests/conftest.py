"""Test harness config: force the CPU backend with 8 virtual devices.

Must run before any jax import (the container's sitecustomize pins
JAX_PLATFORMS=axon, so we override here and again via jax.config).
Multi-device tests then exercise shard_map/halo/scan-carry code paths on the
8-device CPU mesh exactly as they run on a real TPU slice (SURVEY.md §4).
"""

import os

# STEREO_TESTS_TPU=1 leaves the real backend in place so the tpu-marked
# smoke tests (test_tpu_smoke.py) can run on hardware:
#   STEREO_TESTS_TPU=1 python -m pytest tests/test_tpu_smoke.py -m tpu
_ON_TPU = os.environ.get("STEREO_TESTS_TPU", "").lower() not in ("", "0", "false", "no")

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the suite is compile-bound (the FULL
    # AD-Census program alone is ~14 s to build on CPU, ~5 s from cache),
    # so warm re-runs drop from ~13 to ~4-5 minutes.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from stereo_match_traditional_tpu.utils.synthetic import make_pair  # noqa: E402


@pytest.fixture(scope="session")
def tiny_pair():
    return make_pair(32, 44, 10, seed=3)


@pytest.fixture(scope="session")
def small_pair():
    return make_pair(48, 64, 12, seed=1)
