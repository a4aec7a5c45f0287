"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware."""

import os

# Hard override: the ambient environment may point JAX at a TPU tunnel
# (JAX_PLATFORMS=axon); unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize may have imported jax before this file runs, in which case
# the env var above is read too late — force the platform through the config
# as well (observed in the driver environment: tests silently ran on the
# tunnel TPU with bf16-ish matmul precision and different timings).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
