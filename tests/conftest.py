"""Test harness: CPU backend faked as an 8-device mesh, fp64 enabled.

The idiomatic JAX stand-in for "multi-node tests without a cluster"
(SURVEY.md §4d): XLA_FLAGS=--xla_force_host_platform_device_count=8 gives
eight virtual CPU devices so sharding/halo-exchange tests run anywhere.
fp64 is enabled so discretization tests can use exact oracles; library code
always takes explicit dtypes, so this does not leak into defaults.
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS to the real TPU
# plugin; unit tests always run on the virtual 8-device CPU backend.
# DEFF_TESTS_TPU=1 keeps the real TPU backend instead — used to run the
# opt-in Mosaic smoke tests (tests/test_pallas_kernel.py::TestTPUSmoke).
_ON_TPU = bool(os.environ.get("DEFF_TESTS_TPU"))
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The axon sitecustomize may have pinned the platform before this file
    # ran; the config update (pre-backend-init) wins over the inherited env.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference/Deff2DGPU"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference assets not available")
    return REFERENCE_DIR


@pytest.fixture
def rng():
    return np.random.default_rng(42)
