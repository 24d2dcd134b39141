"""Test config.

Provisions 8 virtual CPU devices (used by tests/test_mesh.py via
jax.devices('cpu')). NOTE: JAX_PLATFORMS=cpu does NOT take effect in the
axon image (the plugin overrides it), so single-device tests run on
whatever the default backend is; only the mesh tests explicitly target the
virtual CPU devices."""

import os

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
