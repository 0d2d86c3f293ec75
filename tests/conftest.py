"""Test configuration: run JAX on a virtual 8-device CPU backend so
multi-chip sharding code is exercised without TPU hardware (the
JAX-idiomatic fake-backend pattern, SURVEY.md §4c).

Must run before the first ``import jax`` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The image's sitecustomize imports jax and registers the axon TPU plugin
# before this conftest runs, so the env vars above are too late for the
# platform choice — override via config (backends initialize lazily, so
# XLA_FLAGS above still applies to the CPU client).
jax.config.update("jax_platforms", "cpu")

# This image's XLA executes f32 matmuls at reduced (bf16-style) precision by
# default, which breaks golden comparisons; force full f32 for tests.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
