"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh *before* jax initializes, so the
multi-chip sharding paths are exercised without TPU hardware (the pattern the
reference lacks entirely — it has no tests; see SURVEY.md §4).
"""
import os

# Force CPU even when the session env points at a TPU platform (e.g. axon):
# tests must be hermetic and exercise the virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(seed=1234)
