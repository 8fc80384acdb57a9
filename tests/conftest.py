"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported so
multi-chip mesh/sharding code paths are exercised without TPU hardware
(mirrors how the driver validates `dryrun_multichip`).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a remote TPU backend and pins
# jax_platforms to it, overriding the env var — force CPU explicitly so the
# suite runs locally on the virtual 8-device mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_settings_and_seed():
    """Fresh SETTINGS + deterministic host RNG per test (ref: HowlTest.setUp)."""
    from howl_tpu.settings import SETTINGS
    from howl_tpu.utils.random_utils import set_random_seed

    SETTINGS.reset()
    set_random_seed(0)
    yield
    SETTINGS.reset()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
