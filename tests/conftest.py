"""Test config.

Provisions 8 virtual CPU devices (used by tests/test_mesh.py via
jax.devices('cpu')) and pins the whole suite to the CPU backend so test
runs (a) are hermetic/deterministic and (b) never contend for the real
TPU chip with a concurrent bench. Set X264_TPU_TEST_TPU=1 to run the
suite against the real chip instead.

NOTE: the env var JAX_PLATFORMS=cpu does NOT take effect in the axon
image (the plugin's register() overrides it), but an in-process
jax.config.update('jax_platforms', ...) before first backend use does."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("X264_TPU_TEST_TPU") != "1":
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long e2e encodes; excluded from the default gate lane "
        "(run the full suite with `pytest tests/`, the fast lane with "
        "`pytest tests/ -m 'not slow'`)")
    # build the libavcodec decode oracle once per session (gitignored
    # binary; several e2e tests invoke it directly by path)
    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    exe = os.path.join(tools, "avdec")
    if not os.path.exists(exe):
        import subprocess
        subprocess.run(
            ["gcc", "-O2", os.path.join(tools, "avdec.c"), "-o", exe,
             "-lavcodec", "-lavutil"], capture_output=True)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# NOTE: do NOT enable jax_compilation_cache_dir here — the persistent cache
# interacts pathologically with this image's XLA build (400s+ hangs on
# cache writes for scan-heavy programs). In-process caching is enough.
