"""Test harness config.

Correctness CI runs on the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths execute without TPU hardware.  Must run before
the first ``import jax`` anywhere in the test session.
"""

import os

# The TPU harness environment may pre-load a sitecustomize that imports jax
# and registers a tunneled TPU backend whose compiles run remotely (~25 s
# each).  Correctness tests run on the local CPU backend with 8 virtual
# devices for the multi-chip sharding paths, so we must (a) switch platforms
# via jax.config (env vars are too late — jax is already imported) and
# (b) set XLA_FLAGS before the CPU backend initializes (it's lazy).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

GOLDEN_INTENSITY = (
    "/root/reference/Testsamples/1Flu_Intensity(BCC P0 and P1)/ANA"
)
GOLDEN_FA = "/root/reference/Testsamples/2FA_BND_INT (251127 FA test sample)/Python/ANA"


@pytest.fixture(scope="session")
def golden_intensity_dir():
    if not os.path.isdir(GOLDEN_INTENSITY):
        pytest.skip("golden intensity samples not available")
    return GOLDEN_INTENSITY


@pytest.fixture(scope="session")
def golden_fa_dir():
    if not os.path.isdir(GOLDEN_FA):
        pytest.skip("golden FA samples not available")
    return GOLDEN_FA
