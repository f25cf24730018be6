"""Test harness: force an 8-device CPU platform before JAX initializes.

This is the JAX analogue of a fake distributed backend (SURVEY.md §4): all
sharding/collective tests run against a simulated 8-device mesh on CPU so no
TPU is needed for CI.
"""

import os

# must run before jax's backend initializes.  NOTE: this image pre-sets the
# tunneled-TPU platform ('axon') in a way that overrides the JAX_PLATFORMS
# env var, so the config API is the only reliable switch — unit tests must
# run on the simulated 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# this image's CPU backend emulates matmuls at reduced precision by default;
# tests verify numerics, so pin full precision globally (production code picks
# its compute dtype explicitly, so this does not mask bf16-path bugs).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
