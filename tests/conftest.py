"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware."""

import os

# Hard override: the ambient environment may point JAX at a TPU tunnel
# (JAX_PLATFORMS=axon); unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU's collective rendezvous TERMINATES THE PROCESS when
    # participants miss its window (rendezvous.cc "Terminating process
    # ..."; the sibling warn fires "Thread is unstuck! ... Perhaps the
    # timeout is too short"). On this driver's single-core machine the 8
    # virtual devices oversubscribe one CPU, and long suite runs
    # occasionally starved a participant past the default terminate
    # timeout — a fatal abort mid-suite in whatever sharded program ran
    # at the time. Tests are correctness runs: wait, never kill.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

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


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_accumulation():
    """Drop jax's compiled-program caches after every test module.

    A full-suite process accumulates hundreds of XLA:CPU JIT'd programs;
    past some load the NEXT large compile segfaults inside LLVM
    (observed repeatedly at ~75% of the suite, always on a big program
    that compiles fine standalone and in shorter runs). Clearing between
    modules costs some recompiles of shared programs but keeps the JIT
    footprint bounded."""
    yield
    jax.clear_caches()


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
