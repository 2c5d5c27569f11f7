"""Test harness configuration.

Tests run on a simulated 8-device CPU platform so the sharded/multi-chip
paths are exercised without TPU hardware (SURVEY.md §4d). Pallas kernels
auto-switch to interpreter mode off-TPU.
"""

import os
import sys
from pathlib import Path

# XLA_FLAGS must be set before jax initializes its backends.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
SRC = REPO_ROOT / "src"
if str(SRC) not in sys.path:
    sys.path.insert(0, str(SRC))

import jax

# Forced via config (not the env var): the host environment may pin
# JAX_PLATFORMS to a TPU-tunnel platform at interpreter startup. Set
# LGTPU_TEST_TPU=1 to run the suite on real TPU hardware instead.
if not os.environ.get("LGTPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def require_devices(n: int) -> None:
    """Skip (not fail) mesh tests on backends with fewer devices — the
    LGTPU_TEST_TPU=1 chip suite runs on ONE real device; the sharding paths
    are covered by the simulated 8-CPU mesh and dryrun_multichip."""
    have = len(jax.devices())
    if have < n:
        pytest.skip(f"needs {n} devices, backend has {have}")


@pytest.fixture
def rng():
    return np.random.default_rng(888)  # the demo's fixed seed (demo_mono.cpp:204)
