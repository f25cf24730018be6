"""Test harness: force an 8-device CPU platform before JAX initializes.

This is the JAX analogue of a fake distributed backend (SURVEY.md §4): all
sharding/collective tests run against a simulated 8-device mesh on CPU so no
TPU is needed for CI.
"""

import os

# must run before any `import jax` anywhere in the test session
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# this image's CPU backend emulates matmuls at reduced precision by default;
# tests verify numerics, so pin full precision globally (production code picks
# its compute dtype explicitly, so this does not mask bf16-path bugs).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
