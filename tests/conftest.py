"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths (SURVEY.md §2.4) are exercised without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session."""

import os

# The session environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize module imports jax BEFORE conftest runs, so env-var overrides
# are too late. The XLA_FLAGS env is only read at backend-init time, so it can
# still be set here; the platform itself must be forced through jax.config
# (verified to win over the preloaded axon registration).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import pytest

# JAX's DEFAULT conv/matmul precision is reduced (bf16-class) even on CPU;
# parity tests against the fp32 torch oracle need exact fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
