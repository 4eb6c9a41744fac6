"""Test configuration: force CPU backend with 8 virtual devices.

Must run before any JAX backend initialization. The environment pins
JAX_PLATFORMS=axon (single tunneled TPU with slow remote compiles), so tests
override to CPU via jax.config (env vars are overridden by sitecustomize).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def fixture_root():
    root = os.path.join(os.path.dirname(__file__), "..", "dataset",
                        "fixtures_16_128")
    assert os.path.isdir(root), "run tools/make_fixture.py first"
    return os.path.abspath(root)


@pytest.fixture(scope="session")
def tiny_schedule_opt():
    return {"schedule": "linear", "n_timestep": 10,
            "linear_start": 1e-6, "linear_end": 1e-2}


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
