"""Test configuration: run the suite on CPU with 8 virtual devices.

Numeric parity is platform-independent (f64 everywhere); CPU gives native
f64 and lets sharding tests exercise a virtual 8-device mesh exactly as the
multi-chip dry-run does.  Must set env before jax initializes.
"""

import os

# Note: this environment presets JAX_PLATFORMS=axon (TPU) and the plugin
# ignores env overrides; jax.config.update is the reliable switch.  TPU
# float64 is emulated at ~48-bit precision (abs err ~ magnitude * 2^-48),
# which fails the reference's 1e-12 elementwise bars on lnPI of magnitude
# ~300; CPU f64 is native and exact.  The 1e-8 production parity bar holds
# on TPU (see bench.py, which runs on the real chip).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference/unittests/reference"


@pytest.fixture
def test_nc():
    return os.path.join(REF, "test.nc")


@pytest.fixture
def test2_nc():
    return os.path.join(REF, "test2.nc")


@pytest.fixture
def ref_dir():
    return REF


@pytest.fixture
def rng():
    return np.random.default_rng(42)
