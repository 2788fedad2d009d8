"""Test harness config: CPU backend with 8 virtual devices (the MPI-Stubs /
mpirun-on-one-node analog, SURVEY.md §4), float64 enabled for golden parity.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; only the
# config API reliably selects the CPU backend in this environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN
