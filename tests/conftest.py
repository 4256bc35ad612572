"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the pattern the reference lacks entirely — it
has no tests; see SURVEY.md §4).

NOTE: plain ``os.environ`` assignment is NOT enough here — the session may run
under a TPU PJRT plugin (JAX_PLATFORMS=axon in the process env) which wins
over in-process env mutation. ``jax.config`` applies at backend init and wins.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(seed=1234)
