"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax imports.

Multi-chip sharding tests run against a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) as mandated by SURVEY.md section 4
item 5 — real multi-chip hardware is not available in CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) registers its backend regardless of
# JAX_PLATFORMS; the config update after import reliably pins tests to the
# 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
