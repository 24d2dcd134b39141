"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware. Set X264_TPU_TEST_TPU=1 to test on a real
chip instead."""

import os

if not os.environ.get("X264_TPU_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# NOTE: do NOT enable jax_compilation_cache_dir here — the persistent cache
# interacts pathologically with this image's XLA build (400s+ hangs on
# cache writes for scan-heavy programs). In-process caching is enough.
